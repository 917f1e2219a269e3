import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.ops.roi_align import roi_align

from oracles import roi_align_oracle


@pytest.mark.parametrize("pooled,ratio", [(7, 2), (14, 2), (7, 1)])
def test_roi_align_matches_cpu_kernel(pooled, ratio):
    rng = np.random.default_rng(0)
    H, W, C = 24, 32, 5
    feat = rng.normal(0, 1, (H, W, C)).astype(np.float32)
    # image coords at scale 0.25 → image is 96x128
    rois = np.array(
        [
            [4.0, 8.0, 60.0, 40.0],
            [0.0, 0.0, 95.0, 127.0],  # big box
            [50.0, 30.0, 52.0, 33.0],  # tiny box (roi < 1 cell)
            [-10.0, -10.0, 30.0, 30.0],  # out-of-bounds start
            [100.0, 90.0, 140.0, 130.0],  # partially outside
        ],
        np.float32,
    )
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, pooled, ratio))
    want = roi_align_oracle(feat.astype(np.float64), rois, 0.25, pooled, ratio)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_chunked_equals_unchunked():
    rng = np.random.default_rng(1)
    feat = rng.normal(0, 1, (16, 16, 3)).astype(np.float32)
    rois = np.stack(
        [
            rng.uniform(0, 30, 70),
            rng.uniform(0, 30, 70),
            rng.uniform(32, 60, 70),
            rng.uniform(32, 60, 70),
        ],
        axis=1,
    ).astype(np.float32)
    a = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, 7, 2, roi_chunk=16))
    b = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, 7, 2, roi_chunk=128))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_roi_align_grad_flows_to_features():
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.normal(0, 1, (8, 8, 2)).astype(np.float32))
    rois = jnp.asarray([[2.0, 2.0, 20.0, 20.0]], dtype=jnp.float32)

    def f(x):
        return jnp.sum(roi_align(x, rois, 0.25, 4, 2))

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
