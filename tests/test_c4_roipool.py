import numpy as np
import jax
import jax.numpy as jnp

from mmt_psm_tpu.models.c4 import FastRCNNPredictor, ResNet50Conv5ROIExtractor
from mmt_psm_tpu.ops.roi_pool import roi_pool


def roi_pool_oracle(feat, rois, scale, pooled):
    """Scalar transliteration of ROIPool_cuda.cu semantics."""
    H, W, C = feat.shape
    out = np.zeros((len(rois), pooled, pooled, C), np.float32)
    for n, roi in enumerate(rois):
        # CUDA round(): half away from zero
        x1, y1, x2, y2 = [int(np.sign(v * scale) * np.floor(abs(v * scale) + 0.5)) for v in roi]
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        bh, bw = rh / pooled, rw / pooled
        for ph in range(pooled):
            for pw in range(pooled):
                hs = min(max(int(np.floor(ph * bh)) + y1, 0), H)
                he = min(max(int(np.ceil((ph + 1) * bh)) + y1, 0), H)
                ws = min(max(int(np.floor(pw * bw)) + x1, 0), W)
                we = min(max(int(np.ceil((pw + 1) * bw)) + x1, 0), W)
                region = feat[hs:he, ws:we]
                out[n, ph, pw] = region.max(axis=(0, 1)) if region.size else 0.0
    return out


def test_roi_pool_matches_oracle():
    rng = np.random.default_rng(0)
    feat = rng.normal(0, 1, (16, 20, 3)).astype(np.float32)
    rois = np.array([[0, 0, 40, 30], [8, 4, 60, 50], [70, 50, 79, 63]], np.float32)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 0.25, 7))
    want = roi_pool_oracle(feat, rois, 0.25, 7)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_c4_extractor_and_predictor_shapes():
    rng = np.random.default_rng(1)
    pooled = jnp.asarray(rng.normal(0, 1, (6, 14, 14, 1024)).astype(np.float32))
    ext = ResNet50Conv5ROIExtractor()
    p = ext.init(jax.random.PRNGKey(0), pooled)
    feats = ext.apply(p, pooled)
    assert feats.shape == (6, 7, 7, 2048)

    pred = FastRCNNPredictor(num_classes=3)
    pp = pred.init(jax.random.PRNGKey(1), feats)
    cls, reg = pred.apply(pp, feats)
    assert cls.shape == (6, 3) and reg.shape == (6, 12)
