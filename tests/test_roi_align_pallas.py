"""Pallas windowed-DMA ROIAlign parity (interpret mode on CPU).

The TPU production pooler (ops/roi_align_pallas.py) must agree with the
exact dense formulation (ops/roi_align.py, itself parity-tested against
the transliterated reference oracle in tests/test_roi_align.py /
csrc/cpu/ROIAlign_cpu.cpp) for every level-mapper-consistent box. Runs
the kernel through the Pallas interpreter so CI needs no TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmt_psm_tpu.ops.roi_align_pallas import _dense_pool, multilevel_roi_align_pallas

SCALES = (0.25, 0.125, 0.0625, 0.03125)
SHAPES = [(64, 64), (32, 32), (16, 16), (8, 8)]
IMG = 256


def _boxes(rng, n, max_aspect=2.5):
    out = []
    for _ in range(n):
        cx, cy = rng.uniform(10, IMG - 10, 2)
        area = rng.uniform(12, 200) ** 2
        r = rng.uniform(1 / max_aspect, max_aspect)
        w = np.sqrt(area * r)
        h = np.sqrt(area / r)
        out.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    return np.array(out, np.float32)


@pytest.fixture(scope="module")
def feats():
    rng = np.random.default_rng(0)
    return tuple(
        jnp.asarray(rng.normal(size=(2, h, w, 64)).astype(np.float32)) for h, w in SHAPES
    )


def test_matches_dense_exact(feats):
    rng = np.random.default_rng(1)
    boxes = jnp.asarray(np.stack([_boxes(rng, 40), _boxes(rng, 40)]))
    out_p = multilevel_roi_align_pallas(feats, boxes, SCALES, 7, 2, 48, True)
    out_d = _dense_pool(feats, boxes, SCALES, 7, 2)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d), atol=1e-4)


def test_mask_resolution_and_edge_boxes(feats):
    """P=14 (mask head) + boxes straddling / outside the image edge."""
    rng = np.random.default_rng(2)
    edge = np.array(
        [
            [-20.0, -20.0, 30.0, 25.0],  # upper-left overhang
            [IMG - 30.0, IMG - 25.0, IMG + 40.0, IMG + 40.0],  # lower-right
            [0.0, 0.0, 2.0, 2.0],  # tiny (roi size floors at 1.0)
            [5.0, 200.0, 60.0, 252.0],
        ],
        np.float32,
    )
    boxes = jnp.asarray(np.stack([edge, _boxes(rng, 4)]))
    out_p = multilevel_roi_align_pallas(feats, boxes, SCALES, 14, 2, 48, True)
    out_d = _dense_pool(feats, boxes, SCALES, 14, 2)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d), atol=1e-4)


def test_gradients_flow_via_dense_vjp(feats):
    rng = np.random.default_rng(3)
    boxes = jnp.asarray(np.stack([_boxes(rng, 6), _boxes(rng, 6)]))

    def loss_p(f):
        return jnp.sum(multilevel_roi_align_pallas(f, boxes, SCALES, 7, 2, 48, True) ** 2)

    def loss_d(f):
        return jnp.sum(_dense_pool(f, boxes, SCALES, 7, 2) ** 2)

    g_p = jax.grad(loss_p)(feats)
    g_d = jax.grad(loss_d)(feats)
    for a, b in zip(g_p, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
