import numpy as np
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.ops import nms_pallas
from mmt_psm_tpu.ops.nms import nms_mask

from oracles import nms_oracle, random_boxes

pytestmark = pytest.mark.skipif(not nms_pallas.HAVE_PALLAS, reason="pallas unavailable")


@pytest.mark.parametrize("n,thr,seed", [(100, 0.5, 0), (300, 0.7, 1), (513, 0.3, 2)])
def test_pallas_nms_matches_oracle_interpret(n, thr, seed):
    rng = np.random.default_rng(seed)
    boxes = random_boxes(rng, n, size=300, min_wh=10, max_wh=120)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, dtype=bool)

    want = np.zeros(n, dtype=bool)
    want[nms_oracle(boxes.astype(np.float64), scores, thr)] = True
    got = np.asarray(
        nms_pallas.nms_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thr, interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)
    # and agrees with the XLA implementation
    xla = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thr))
    np.testing.assert_array_equal(got, xla)


def test_pallas_nms_multichunk_interpret():
    """The chunked later-pass (VMEM fix for the C4 config's 12k-wide
    NMS): n spanning several chunks, with a chunk boundary mid-tile
    coverage and padding past the last chunk, must stay exact-greedy."""
    rng = np.random.default_rng(7)
    n, thr = 1700, 0.5  # chunk ceiling 512 -> 4 equal chunks of 448, pad 1700 -> 1792
    boxes = random_boxes(rng, n, size=500, min_wh=8, max_wh=90)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[-50:] = False

    order = np.argsort(-np.where(valid, scores, nms_pallas.NEG_INF))
    supp = np.asarray(
        nms_pallas.nms_suppress_pallas(
            jnp.asarray(boxes[order]), jnp.asarray(valid[order].astype(np.float32)),
            thr, chunk=512, interpret=True,
        )
    )
    got = np.zeros(n, bool)
    got[order] = np.logical_and(supp < 0.5, valid[order])

    nv = valid.nonzero()[0]
    want = np.zeros(n, dtype=bool)
    want[nv[nms_oracle(boxes[nv].astype(np.float64), scores[nv], thr)]] = True
    np.testing.assert_array_equal(got, want)


def test_pallas_nms_respects_valid_interpret():
    rng = np.random.default_rng(3)
    boxes = random_boxes(rng, 64)
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    valid = np.zeros(64, bool)
    valid[:30] = True
    got = np.asarray(
        nms_pallas.nms_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, interpret=True
        )
    )
    assert not got[30:].any()
    want = np.zeros(30, bool)
    want[nms_oracle(boxes[:30].astype(np.float64), scores[:30], 0.5)] = True
    np.testing.assert_array_equal(got[:30], want)
