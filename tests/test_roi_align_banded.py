"""Banded ROIAlign parity vs the exact kernel.

The banded impl (ops/roi_align_banded.py) must be bit-equal to the
exact contraction for level-mapper-consistent RoIs, and within float
noise even when oversized unassigned boxes share a sorted chunk.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.ops.pooler import multilevel_roi_align
from mmt_psm_tpu.ops.roi_align_banded import multilevel_roi_align_banded, roi_align_banded

SCALES = (0.25, 0.125, 0.0625, 0.03125)


def _feats(h=256, c=16, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.normal(size=(h // 2**i, h // 2**i, c)).astype(np.float32)) for i in range(4)]


def _cell_boxes(n, seed=1, lo=15, hi=110, canvas=1024):
    rng = np.random.default_rng(seed)
    wh = rng.uniform(lo, hi, (n, 2))
    ar = rng.uniform(0.4, 2.5, n)
    wh[:, 0] *= np.sqrt(ar)
    wh[:, 1] /= np.sqrt(ar)
    xy = rng.uniform(0, canvas - hi - 20, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_banded_exact_for_cell_boxes():
    feats = _feats()
    boxes = jnp.asarray(_cell_boxes(600))
    exact = multilevel_roi_align(list(feats), boxes, SCALES, 7, 2)
    banded = multilevel_roi_align_banded(list(feats), boxes, SCALES, 7, 2)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(banded))


def test_banded_with_oversized_unassigned_boxes():
    # big boxes go to deep levels (exact fallback there); they may share
    # sorted chunks at P2 but must not disturb assigned rois beyond float
    # noise
    rng = np.random.default_rng(3)
    big = np.concatenate(
        [rng.uniform(0, 200, (40, 2)), rng.uniform(500, 800, (40, 2))], -1
    ).astype(np.float32)
    big[:, 2:] += big[:, :2]
    big = np.clip(big, 0, 1023)
    boxes = jnp.asarray(np.concatenate([big, _cell_boxes(560, seed=4)], 0))
    feats = _feats()
    exact = multilevel_roi_align(list(feats), boxes, SCALES, 7, 2)
    banded = multilevel_roi_align_banded(list(feats), boxes, SCALES, 7, 2)
    scale = float(jnp.max(jnp.abs(exact)))
    assert float(jnp.max(jnp.abs(exact - banded))) <= 1e-3 * scale


def test_banded_small_set_falls_back_exact():
    # band >= H -> exact kernel; also the adaptive chunk covers few-roi sets
    feats = _feats(h=96)
    boxes = jnp.asarray(_cell_boxes(40, canvas=380, hi=60))
    exact = multilevel_roi_align(list(feats), boxes, SCALES, 14, 2)
    banded = multilevel_roi_align_banded(list(feats), boxes, SCALES, 14, 2)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(banded))


def test_banded_preserves_input_order():
    feats = _feats()
    boxes_np = _cell_boxes(128)
    boxes = jnp.asarray(boxes_np)
    out = roi_align_banded(feats[0], boxes, 0.25, 7, 2)
    # reversing the input reverses the output rows
    out_rev = roi_align_banded(feats[0], boxes[::-1], 0.25, 7, 2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_rev)[::-1])
