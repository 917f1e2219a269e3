import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.ops.matcher import match
from mmt_psm_tpu.ops.sampler import sample

from oracles import iou_oracle, matcher_oracle, random_boxes


@pytest.mark.parametrize("allow_lq,seed", [(False, 0), (True, 1), (True, 2)])
def test_matcher_matches_oracle(allow_lq, seed):
    rng = np.random.default_rng(seed)
    gt = random_boxes(rng, 8)
    pred = random_boxes(rng, 100)
    q = iou_oracle(gt.astype(np.float64), pred.astype(np.float64)).astype(np.float32)

    want = matcher_oracle(q.copy(), 0.7, 0.3, allow_lq)
    got = np.asarray(match(jnp.asarray(q), jnp.ones(8, bool), 0.7, 0.3, allow_lq))
    np.testing.assert_array_equal(got, want)


def test_matcher_ignores_padded_gt():
    rng = np.random.default_rng(3)
    gt = random_boxes(rng, 10)
    pred = random_boxes(rng, 40)
    q = iou_oracle(gt.astype(np.float64), pred.astype(np.float64)).astype(np.float32)
    gt_valid = np.zeros(10, bool)
    gt_valid[:4] = True

    want = matcher_oracle(q[:4].copy(), 0.5, 0.5, True)
    got = np.asarray(match(jnp.asarray(q), jnp.asarray(gt_valid), 0.5, 0.5, True))
    np.testing.assert_array_equal(got, want)


def test_sampler_counts_and_balance():
    rng_np = np.random.default_rng(4)
    labels = np.zeros(300, np.int32)
    labels[:30] = 1  # 30 positives
    labels[250:] = -1  # 50 ignored
    idx, is_pos, valid = sample(jax.random.PRNGKey(0), jnp.asarray(labels), 256, 0.25)
    idx, is_pos, valid = np.asarray(idx), np.asarray(is_pos), np.asarray(valid)
    # 30 < 64 positives available -> all 30 taken, then all 220 negatives
    assert is_pos.sum() == 30
    assert valid.sum() == 250
    assert (labels[idx[is_pos]] >= 1).all()
    neg_idx = idx[valid & ~is_pos]
    assert (labels[neg_idx] == 0).all()
    assert len(np.unique(idx[valid])) == valid.sum()  # no repeats


def test_sampler_caps_positives():
    labels = np.ones(300, np.int32)  # all positive
    idx, is_pos, valid = sample(jax.random.PRNGKey(1), jnp.asarray(labels), 256, 0.25)
    assert np.asarray(is_pos).sum() == 64
    assert np.asarray(valid).sum() == 64  # no negatives available


def test_sampler_fewer_candidates_than_batch():
    labels = np.full(100, -1, np.int32)
    labels[:5] = 1
    labels[5:15] = 0
    idx, is_pos, valid = sample(jax.random.PRNGKey(2), jnp.asarray(labels), 256, 0.5)
    assert np.asarray(valid).sum() == 15
    assert np.asarray(is_pos).sum() == 5
