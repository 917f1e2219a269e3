"""ROIPool (max pooling over RoI bins).

Parity-completeness port of the reference's ROIPool kernel
(reference: csrc/cuda/ROIPool_cuda.cu, wrapper layers/roi_pool.py) —
built but unused by the pap configs, whose Pooler hard-codes ROIAlign
(modeling/poolers.py:45-49). Semantics: rois scaled by spatial_scale
then *rounded*, bin boundaries floor/ceil, empty bins yield 0.

Fixed-shape formulation: per output row/col, a boolean membership mask
over the feature axis + masked max (P is static so the loop unrolls).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _round_half_away(x):
    """CUDA round() semantics (half away from zero) — the reference
    kernel's rounding; also deterministic across XLA lowerings."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _roi_pool_one(feat, roi, spatial_scale, pooled: int):
    h, w = feat.shape[0], feat.shape[1]
    x1 = _round_half_away(roi[0] * spatial_scale)
    y1 = _round_half_away(roi[1] * spatial_scale)
    x2 = _round_half_away(roi[2] * spatial_scale)
    y2 = _round_half_away(roi[3] * spatial_scale)
    # rounded coords are integers, so bin boundaries floor(p*L/P) /
    # ceil(p*L/P) are computed in exact integer arithmetic — float
    # division here is not XLA-stable (x/P may lower to x*(1/P), which
    # flips ceil() on exact bin edges)
    x1i = x1.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    roi_w = jnp.maximum((x2 - x1 + 1).astype(jnp.int32), 1)
    roi_h = jnp.maximum((y2 - y1 + 1).astype(jnp.int32), 1)

    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)

    rows = []
    neg = jnp.asarray(-jnp.inf, feat.dtype)
    for ph in range(pooled):
        hstart = jnp.clip((ph * roi_h) // pooled + y1i, 0, h)
        hend = jnp.clip(-((-(ph + 1) * roi_h) // pooled) + y1i, 0, h)
        row_mask = (ys >= hstart) & (ys < hend)  # [H]
        masked = jnp.where(row_mask[:, None, None], feat, neg)
        rows.append(jnp.max(masked, axis=0))  # [W, C]
    row_stack = jnp.stack(rows)  # [P, W, C]

    out = []
    for pw in range(pooled):
        wstart = jnp.clip((pw * roi_w) // pooled + x1i, 0, w)
        wend = jnp.clip(-((-(pw + 1) * roi_w) // pooled) + x1i, 0, w)
        col_mask = (xs >= wstart) & (xs < wend)
        masked = jnp.where(col_mask[None, :, None], row_stack, neg)
        out.append(jnp.max(masked, axis=1))  # [P, C]
    res = jnp.stack(out, axis=1)  # [P, P, C]
    return jnp.where(jnp.isfinite(res), res, 0.0)  # empty bins -> 0


@partial(jax.jit, static_argnames=("pooled_size", "roi_chunk"))
def roi_pool(features, rois, spatial_scale: float, pooled_size: int, roi_chunk: int = 32):
    """features: [H, W, C]; rois: [N, 4] image coords -> [N, P, P, C]."""
    fn = partial(_roi_pool_one, features, spatial_scale=spatial_scale, pooled=pooled_size)
    n = rois.shape[0]
    if n <= roi_chunk:
        return jax.vmap(fn)(rois)
    pad = (-n) % roi_chunk
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    out = jax.lax.map(jax.vmap(fn), rois_p.reshape(-1, roi_chunk, 4))
    return out.reshape(-1, pooled_size, pooled_size, features.shape[-1])[:n]
