import numpy as np
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.ops.pooler import multilevel_roi_align
from mmt_psm_tpu.ops.roi_align_windowed import multilevel_roi_align_windowed


def _feats(rng, base=64, c=8, levels=4):
    return [jnp.asarray(rng.normal(0, 1, (base // 2**i, base // 2**i, c)).astype(np.float32)) for i in range(levels)]


def _level_consistent_boxes(rng, n, image=256):
    """Boxes whose bilinear support fits the 32-cell window on their
    assigned level: aspect ratio <= 2 (the anchor set's range), so
    span <= sqrt(2)*sqrt(area) <= sqrt(2)*28 cells < 30."""
    out = []
    for _ in range(n):
        w = rng.uniform(8, 180)
        h = w * rng.uniform(0.5, 2.0)
        h = min(h, 180)
        x1 = rng.uniform(0, image - w)
        y1 = rng.uniform(0, max(image - h, 1))
        out.append([x1, y1, x1 + w, y1 + h])
    return jnp.asarray(np.asarray(out, np.float32))


@pytest.mark.parametrize("pooled,ratio", [(7, 2), (14, 2)])
def test_windowed_matches_exact(pooled, ratio):
    rng = np.random.default_rng(0)
    feats = _feats(rng)
    boxes = _level_consistent_boxes(rng, 40)
    scales = (0.25, 0.125, 0.0625, 0.03125)
    exact = np.asarray(multilevel_roi_align(feats, boxes, scales, pooled, ratio))
    fast = np.asarray(
        multilevel_roi_align_windowed(tuple(feats), boxes, scales, pooled, ratio, window=48)
    )
    np.testing.assert_allclose(fast, exact, rtol=1e-4, atol=1e-4)


def test_windowed_chunked_equals_unchunked():
    rng = np.random.default_rng(1)
    feats = _feats(rng)
    boxes = _level_consistent_boxes(rng, 70)
    scales = (0.25, 0.125, 0.0625, 0.03125)
    a = np.asarray(multilevel_roi_align_windowed(tuple(feats), boxes, scales, 7, 2, roi_chunk=16))
    b = np.asarray(multilevel_roi_align_windowed(tuple(feats), boxes, scales, 7, 2, roi_chunk=128))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_windowed_handles_degenerate_boxes():
    rng = np.random.default_rng(2)
    feats = _feats(rng)
    scales = (0.25, 0.125, 0.0625, 0.03125)
    boxes = jnp.asarray([[0.0, 0.0, 0.0, 0.0], [255.0, 255.0, 255.0, 255.0], [0.0, 0.0, 255.0, 255.0]])
    out = np.asarray(multilevel_roi_align_windowed(tuple(feats), boxes, scales, 7, 2))
    assert np.isfinite(out).all()
