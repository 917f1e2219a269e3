import numpy as np
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.ops.nms import nms_mask, nms_mask_reference, nms_topk

from oracles import nms_oracle, random_boxes


@pytest.mark.parametrize("n,thr,seed", [(60, 0.5, 0), (200, 0.7, 1), (513, 0.3, 2), (128, 0.5, 3)])
def test_nms_matches_oracle(n, thr, seed):
    rng = np.random.default_rng(seed)
    boxes = random_boxes(rng, n, size=300, min_wh=10, max_wh=120)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, dtype=bool)

    want_keep = np.zeros(n, dtype=bool)
    want_keep[nms_oracle(boxes.astype(np.float64), scores, thr)] = True

    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thr))
    got_ref = np.asarray(
        nms_mask_reference(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thr)
    )
    np.testing.assert_array_equal(got_ref, want_keep)
    np.testing.assert_array_equal(got, want_keep)


def test_nms_respects_valid_mask():
    rng = np.random.default_rng(7)
    boxes = random_boxes(rng, 50)
    scores = rng.uniform(0, 1, 50).astype(np.float32)
    valid = np.zeros(50, dtype=bool)
    valid[:20] = True

    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5))
    assert not got[20:].any()

    want = np.zeros(20, dtype=bool)
    want[nms_oracle(boxes[:20].astype(np.float64), scores[:20], 0.5)] = True
    np.testing.assert_array_equal(got[:20], want)


def test_nms_topk_ordering_and_padding():
    rng = np.random.default_rng(8)
    n = 40
    boxes = random_boxes(rng, n, size=2000, min_wh=5, max_wh=20)  # sparse: few suppressions
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    idx, v = nms_topk(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, max_out=64)
    idx, v = np.asarray(idx), np.asarray(v)
    kept = idx[v]
    # score order, descending
    assert (np.diff(scores[kept]) <= 1e-7).all()
    want = nms_oracle(boxes.astype(np.float64), scores, 0.5)
    np.testing.assert_array_equal(np.sort(kept), np.sort(want))
    assert v.sum() == len(want)


def test_nms_identical_boxes():
    boxes = np.tile(np.array([[10.0, 10.0, 50.0, 50.0]], np.float32), (5, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(5, bool), 0.5))
    np.testing.assert_array_equal(got, [True, False, False, False, False])
