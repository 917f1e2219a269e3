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
    out_p = multilevel_roi_align_pallas(feats, boxes, SCALES, 7, 2, 48, 8, True)
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
    out_p = multilevel_roi_align_pallas(feats, boxes, SCALES, 14, 2, 48, 8, True)
    out_d = _dense_pool(feats, boxes, SCALES, 14, 2)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d), atol=1e-4)


def test_gradients_flow_via_dense_vjp(feats):
    rng = np.random.default_rng(3)
    boxes = jnp.asarray(np.stack([_boxes(rng, 6), _boxes(rng, 6)]))

    def loss_p(f):
        return jnp.sum(multilevel_roi_align_pallas(f, boxes, SCALES, 7, 2, 48, 8, True) ** 2)

    def loss_d(f):
        return jnp.sum(_dense_pool(f, boxes, SCALES, 7, 2) ** 2)

    g_p = jax.grad(loss_p)(feats)
    g_d = jax.grad(loss_d)(feats)
    for a, b in zip(g_p, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_windowed_backward_random_cotangent(feats):
    """The Pallas RMW backward vs the dense linear_transpose under a
    random (non-symmetric) cotangent, P=7 and P=14, including clustered
    boxes that share identical 8-aligned windows and edge boxes."""
    rng = np.random.default_rng(4)
    cluster = _boxes(rng, 10)
    cluster[5:] = cluster[:5] + rng.uniform(-3, 3, (5, 4)).astype(np.float32)
    edge = np.array(
        [[-20.0, -20.0, 30.0, 25.0], [IMG - 30.0, IMG - 25.0, IMG + 40.0, IMG + 40.0]],
        np.float32,
    )
    boxes = jnp.asarray(
        np.stack([np.concatenate([cluster, edge]), _boxes(rng, 12)])
    )
    for pooled in (7, 14):
        out_p, vjp_p = jax.vjp(
            lambda f: multilevel_roi_align_pallas(f, boxes, SCALES, pooled, 2, 48, 8, True), feats
        )
        out_d, vjp_d = jax.vjp(lambda f: _dense_pool(f, boxes, SCALES, pooled, 2), feats)
        g = jnp.asarray(rng.normal(size=out_p.shape).astype(np.float32))
        g_p = vjp_p(g)[0]
        g_d = vjp_d(g)[0]
        for a, b in zip(g_p, g_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_backward_impl_dense_flag(feats):
    """BACKWARD_IMPL='dense' routes the VJP through the linear_transpose
    oracle; both implementations agree."""
    import mmt_psm_tpu.ops.roi_align_pallas as rap

    rng = np.random.default_rng(5)
    boxes = jnp.asarray(np.stack([_boxes(rng, 5), _boxes(rng, 5)]))

    def loss(f):
        return jnp.sum(multilevel_roi_align_pallas(f, boxes, SCALES, 7, 2, 48, 8, True) ** 2)

    g_win = jax.grad(loss)(feats)
    old = rap.BACKWARD_IMPL
    try:
        rap.BACKWARD_IMPL = "dense"
        jax.clear_caches()  # the impl flag is read at trace time
        g_dense = jax.grad(loss)(feats)
    finally:
        rap.BACKWARD_IMPL = old
        jax.clear_caches()
    for a, b in zip(g_win, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_windowed_backward_bf16():
    """bf16 features (the production compute dtype): cotangents come back
    bf16 and agree with the f32 dense transpose to bf16 resolution."""
    rng = np.random.default_rng(6)
    feats16 = tuple(
        jnp.asarray(rng.normal(size=(1, h, w, 64)).astype(np.float32), jnp.bfloat16)
        for h, w in SHAPES
    )
    boxes = jnp.asarray(_boxes(rng, 16)[None])

    def loss16(f):
        return jnp.sum(
            multilevel_roi_align_pallas(f, boxes, SCALES, 7, 2, 48, 8, True).astype(jnp.float32) ** 2
        )

    g16 = jax.grad(loss16)(feats16)
    feats32 = tuple(f.astype(jnp.float32) for f in feats16)

    def loss32(f):
        return jnp.sum(_dense_pool(f, boxes, SCALES, 7, 2) ** 2)

    g32 = jax.grad(loss32)(feats32)
    for a, b in zip(g16, g32):
        assert a.dtype == jnp.bfloat16
        a = np.asarray(a.astype(jnp.float32))
        b = np.asarray(b)
        denom = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / denom < 0.03, np.abs(a - b).max() / denom


@pytest.mark.parametrize("align", [16, 32, 64])
def test_align_sweep_matches_dense(feats, align):
    """Start-alignment coarsening is a pure traffic/dedup trade — the
    pooled values must be EXACT for any align (the interpolation
    matrices are window-local; ops/roi_align_pallas._window_plan)."""
    rng = np.random.default_rng(7)
    boxes = jnp.asarray(np.stack([_boxes(rng, 24), _boxes(rng, 24)]))
    out_p = multilevel_roi_align_pallas(feats, boxes, SCALES, 7, 2, 48, align, True)
    out_d = _dense_pool(feats, boxes, SCALES, 7, 2)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d), atol=1e-4)


def test_align_backward_matches_dense(feats):
    """Windowed scatter-add backward under coarse alignment: cotangent
    parity vs the dense linear_transpose."""
    rng = np.random.default_rng(8)
    boxes = jnp.asarray(np.stack([_boxes(rng, 12), _boxes(rng, 12)]))

    def f_coarse(f):
        return jnp.sum(multilevel_roi_align_pallas(f, boxes, SCALES, 7, 2, 48, 32, True) ** 2)

    def f_dense(f):
        return jnp.sum(_dense_pool(f, boxes, SCALES, 7, 2) ** 2)

    g_c = jax.grad(f_coarse)(feats)
    g_d = jax.grad(f_dense)(feats)
    for a, b in zip(g_c, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
