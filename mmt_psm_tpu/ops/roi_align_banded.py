"""Banded ROIAlign: sorted-chunk row-band contraction.

The exact formulation (ops/roi_align.py) contracts every RoI chunk
against ALL H rows of the level map: ``[n*P, H] @ [H, W*C]``. A cell
detector's RoIs are short (the FPN level mapper bounds sqrt(area) per
level — reference modeling/poolers.py:11-42 eq.1), so almost all of H
is dead weight at the big P2 level.

This impl sorts RoIs by y-center so each chunk of consecutive RoIs
spans a narrow row range, then contracts against one
``lax.dynamic_slice`` row band: ``[chunk*P, band] @ [band, W*C]`` —
band/H of the FLOPs. The x axis stays full-width (the x contraction is
the cheap second stage). Outputs scatter back to input order.

Guarantees:
* banding only engages when ``band < H`` (at the 1024 canvas that is
  P2 only; deeper levels fall through to the exact kernel);
* the band origin is computed from the rois *assigned to this level*
  (``level_mask``) — unassigned giants sharing a chunk clamp to the
  band edge, but their output is discarded by the pooler's level
  select, so the result is exact for every assigned roi;
* the chunk size adapts to the roi count (``chunk <= n * band / 2H``)
  so a sorted chunk's center span stays <= band/2, leaving band/2 for
  the level-bounded roi extent (aspect-3 outliers at P2 span ~48 < 64
  rows). Exactness vs the exact kernel is pinned by
  tests/test_roi_align_banded.py.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .roi_align import _axis_weights, roi_align


def _axis_weights_shifted(start, size, pooled: int, grid: int, dim: int, origin, band: int, dtype):
    """[pooled, band] interpolation matrix relative to a row origin.

    Same f32 math as roi_align._axis_weights with positions expressed
    band-locally; rows outside the band clamp to its edge."""
    f32 = jnp.float32
    bin_size = jnp.asarray(size, f32) / pooled
    start = jnp.asarray(start, f32)
    p = jnp.arange(pooled, dtype=f32)[:, None]
    i = jnp.arange(grid, dtype=f32)[None, :]
    coord = start + p * bin_size + (i + 0.5) * bin_size / grid

    inb = (coord >= -1.0) & (coord <= dim)
    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c)
    at_edge = low >= dim - 1
    low = jnp.where(at_edge, dim - 1.0, low)
    frac = jnp.where(at_edge, 0.0, c - low)
    high = jnp.where(at_edge, low, low + 1.0)

    w_low = jnp.where(inb, 1.0 - frac, 0.0) / grid
    w_high = jnp.where(inb, frac, 0.0) / grid

    low_rel = jnp.clip(low - origin, 0, band - 1).astype(jnp.int32)
    high_rel = jnp.clip(high - origin, 0, band - 1).astype(jnp.int32)
    onehot_low = jax.nn.one_hot(low_rel, band, dtype=f32)
    onehot_high = jax.nn.one_hot(high_rel, band, dtype=f32)
    A = jnp.sum(w_low[..., None] * onehot_low + w_high[..., None] * onehot_high, axis=1)
    return A.astype(dtype)


@partial(jax.jit, static_argnames=("pooled_size", "sampling_ratio", "band"))
def roi_align_banded(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    pooled_size: int,
    sampling_ratio: int,
    level_mask: jnp.ndarray | None = None,
    band: int = 128,
) -> jnp.ndarray:
    """features: [H, W, C] (single image); rois: [N, 4] image coords;
    level_mask: bool [N], rois whose output must be exact (defaults to
    all). Returns [N, P, P, C] in input order."""
    h, w, c = features.shape
    dtype = features.dtype
    n = rois.shape[0]
    if band >= h:
        return roi_align(features, rois, spatial_scale, pooled_size, sampling_ratio)
    if level_mask is None:
        level_mask = jnp.ones(n, bool)

    # sorted-chunk sizing: center span <= H * chunk / n must stay <= band/2
    roi_chunk = max(32, min(512, int(n * band / (2 * h)) // 32 * 32 or 32))

    yc = (rois[:, 1] + rois[:, 3]) * 0.5
    order = jnp.argsort(yc)
    rois_s = rois[order]
    mask_s = level_mask[order]

    pad = (-n) % roi_chunk
    # edge-pad: zero rois would drag the final chunk's band origin to
    # row 0 and clamp its real rois out of band
    rois_p = jnp.pad(rois_s, ((0, pad), (0, 0)), mode="edge")
    mask_p = jnp.pad(mask_s, ((0, pad),), mode="edge")
    flat = features.reshape(h, w * c)

    def chunk_fn(args):
        cr, cm = args
        sy = cr[:, 1] * spatial_scale
        # band origin from the assigned rois only; a chunk with none
        # assigned contributes nothing downstream — any origin works
        base = jnp.where(jnp.any(cm), jnp.min(jnp.where(cm, sy, jnp.inf)), 0.0)
        origin = jnp.clip(jnp.floor(base) - 1.0, 0.0, float(h - band))
        bandfeat = jax.lax.dynamic_slice(flat, (origin.astype(jnp.int32), 0), (band, w * c))

        def weights(r):
            sx = r[0] * spatial_scale
            s_y = r[1] * spatial_scale
            rw = jnp.maximum(r[2] * spatial_scale - sx, 1.0)
            rh = jnp.maximum(r[3] * spatial_scale - s_y, 1.0)
            Ay = _axis_weights_shifted(s_y, rh, pooled_size, sampling_ratio, h, origin, band, dtype)
            Ax = _axis_weights(sx, rw, pooled_size, sampling_ratio, w, dtype)
            return Ay, Ax

        Ay, Ax = jax.vmap(weights)(cr)  # [ch, P, band], [ch, P, W]
        tmp = jnp.dot(
            Ay.reshape(roi_chunk * pooled_size, band), bandfeat, preferred_element_type=dtype
        ).reshape(roi_chunk, pooled_size, w, c)
        return jnp.einsum("nqw,npwc->npqc", Ax, tmp, preferred_element_type=dtype)

    out = jax.lax.map(
        chunk_fn, (rois_p.reshape(-1, roi_chunk, 4), mask_p.reshape(-1, roi_chunk))
    ).reshape(-1, pooled_size, pooled_size, c)[:n]
    # scatter back to the caller's order
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(n))
    return out[inv]


def multilevel_roi_align_banded(
    features,
    boxes: jnp.ndarray,
    scales,
    output_size: int,
    sampling_ratio: int,
    band: int = 128,
):
    """Drop-in for pooler.multilevel_roi_align with banded per-level pools."""
    from .pooler import assign_levels

    num_levels = len(scales)
    if num_levels == 1:
        return roi_align_banded(features[0], boxes, scales[0], output_size, sampling_ratio, band=band)

    k_min = int(-math.log2(scales[0]))
    k_max = int(-math.log2(scales[-1]))
    levels = assign_levels(boxes, k_min, k_max)

    out = None
    for lvl, (feat, scale) in enumerate(zip(features, scales)):
        pooled = roi_align_banded(
            feat, boxes, scale, output_size, sampling_ratio,
            level_mask=levels == lvl, band=band,
        )
        sel = (levels == lvl).astype(pooled.dtype)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out
