"""Windowed multi-level ROIAlign — the production fast path.

The exact formulation in ops/roi_align.py contracts each RoI against the
*entire* level feature map and runs once per FPN level (4x overcompute
in the pooler). This version exploits the FPN level mapper's guarantee
that an RoI spans only ~14-28 cells on its assigned level
(reference: modeling/poolers.py:11-42, eq.1): it gathers one
``window x window`` crop around the RoI from a flattened all-level
buffer and contracts the separable interpolation weights against that
crop — O(window^2 C) per RoI instead of O(sum_l H_l W_l C), ~100x fewer
FLOPs and one gather instead of four level passes.

Exactness: identical to the reference kernel whenever the RoI's
bilinear support fits the window (span <= window-2 cells on its level —
true for level-mapper-consistent boxes of aspect ratio <= ~2.7 with
the default window=48; the worst case at a level boundary is
112*sqrt(2)/4 ~= 40 cells). Oversized RoIs clamp their outermost samples to the window
edge; a parity test pins the in-window case to the exact kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pooler import assign_levels


def _axis_weights_windowed(start, size, pooled, grid, dim, origin, window, dtype):
    """[pooled, window] interpolation matrix relative to a window origin.

    Same math as roi_align._axis_weights (and the reference
    ROIAlign_cpu.cpp:33-103) with positions expressed window-locally.
    ``dim`` (true level extent) and ``origin`` are traced scalars.
    """
    bin_size = size / pooled
    p = jnp.arange(pooled, dtype=dtype)[:, None]
    i = jnp.arange(grid, dtype=dtype)[None, :]
    coord = start + p * bin_size + (i + 0.5) * bin_size / grid  # [P, G]

    inb = (coord >= -1.0) & (coord <= dim)
    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c)
    at_edge = low >= dim - 1
    low = jnp.where(at_edge, dim - 1.0, low)
    frac = jnp.where(at_edge, 0.0, c - low)
    high = jnp.where(at_edge, low, low + 1.0)

    w_low = jnp.where(inb, 1.0 - frac, 0.0) / grid
    w_high = jnp.where(inb, frac, 0.0) / grid

    rel = jnp.arange(window, dtype=dtype)
    low_rel = jnp.clip(low - origin, 0, window - 1)
    high_rel = jnp.clip(high - origin, 0, window - 1)
    onehot_low = (low_rel[..., None] == rel).astype(dtype)
    onehot_high = (high_rel[..., None] == rel).astype(dtype)
    return jnp.sum(w_low[..., None] * onehot_low + w_high[..., None] * onehot_high, axis=1)


@partial(jax.jit, static_argnames=("scales", "output_size", "sampling_ratio", "window", "roi_chunk"))
def multilevel_roi_align_windowed(
    features,
    boxes,
    scales: tuple,
    output_size: int,
    sampling_ratio: int,
    window: int = 48,
    roi_chunk: int = 64,
):
    """features: tuple of [H_l, W_l, C] (single image); boxes: [N, 4]
    image coords. Returns [N, P, P, C]."""
    num_levels = len(scales)
    c = features[0].shape[-1]
    dtype = features[0].dtype

    # flatten all levels into one [sum(H*W), C] buffer (+1 zero row pad)
    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)
    heights = jnp.asarray([f.shape[0] for f in features])
    widths = jnp.asarray([f.shape[1] for f in features])
    offsets_list = []
    acc = 0
    for f in features:
        offsets_list.append(acc)
        acc += f.shape[0] * f.shape[1]
    offsets = jnp.asarray(offsets_list)
    scales_arr = jnp.asarray(scales, jnp.float32)

    import math

    k_min = int(-math.log2(scales[0]))
    k_max = int(-math.log2(scales[-1]))
    levels = assign_levels(boxes, k_min, k_max) if num_levels > 1 else jnp.zeros(boxes.shape[0], jnp.int32)

    def one(box, lvl):
        scale = scales_arr[lvl]
        h = heights[lvl]
        w = widths[lvl]
        off = offsets[lvl]
        sx = box[0] * scale
        sy = box[1] * scale
        ex = box[2] * scale
        ey = box[3] * scale
        rw = jnp.maximum(ex - sx, 1.0)
        rh = jnp.maximum(ey - sy, 1.0)

        ox = jnp.clip(jnp.floor(sx) - 1, 0, jnp.maximum(w - window, 0)).astype(jnp.int32)
        oy = jnp.clip(jnp.floor(sy) - 1, 0, jnp.maximum(h - window, 0)).astype(jnp.int32)

        rows = oy + jnp.arange(window)
        cols = ox + jnp.arange(window)
        rows = jnp.minimum(rows, h - 1)
        cols = jnp.minimum(cols, w - 1)
        flat_idx = off + rows[:, None] * w + cols[None, :]
        crop = flat[flat_idx.reshape(-1)].reshape(window, window, c)

        ay = _axis_weights_windowed(sy, rh, output_size, sampling_ratio, h.astype(jnp.float32), oy.astype(jnp.float32), window, jnp.float32).astype(dtype)
        ax = _axis_weights_windowed(sx, rw, output_size, sampling_ratio, w.astype(jnp.float32), ox.astype(jnp.float32), window, jnp.float32).astype(dtype)
        tmp = jnp.einsum("ph,hwc->pwc", ay, crop, preferred_element_type=dtype)
        return jnp.einsum("qw,pwc->pqc", ax, tmp, preferred_element_type=dtype)

    n = boxes.shape[0]
    if n <= roi_chunk:
        return jax.vmap(one)(boxes, levels)
    pad = (-n) % roi_chunk
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    levels_p = jnp.pad(levels, ((0, pad),))
    out = jax.lax.map(
        lambda args: jax.vmap(one)(*args),
        (boxes_p.reshape(-1, roi_chunk, 4), levels_p.reshape(-1, roi_chunk)),
    )
    return out.reshape(-1, output_size, output_size, c)[:n]
