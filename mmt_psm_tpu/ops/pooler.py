"""Multi-level FPN pooler.

Parity with reference Pooler + LevelMapper (reference:
maskrcnn_benchmark/modeling/poolers.py:11-121): each RoI is assigned an
FPN level by eq.(1), lvl = floor(4 + log2(sqrt(area)/224 + 1e-6))
clamped to [k_min, k_max], then ROIAligned on that level's map.

The reference scatters RoIs into per-level dynamic batches
(poolers.py:116-119). Fixed-shape version: pool every RoI on every
level and select by a one-hot level mask — shapes stay static and the
selects fuse into the pooling matmuls. (A windowed single-gather fast
path can replace this later without changing the interface.)
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..structures.boxes import box_area
from .roi_align import roi_align


def assign_levels(boxes: jnp.ndarray, k_min: int, k_max: int, canonical_scale: int = 224, canonical_level: int = 4, eps: float = 1e-6):
    """FPN eq.(1) level ids, 0-based from k_min (poolers.py:31-42)."""
    s = jnp.sqrt(box_area(boxes))
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + eps))
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def multilevel_roi_align(
    features,
    boxes: jnp.ndarray,
    scales,
    output_size: int,
    sampling_ratio: int,
    roi_chunk: int = 1024,
):
    """Pool [N, 4] boxes from per-level NHWC feature maps (single image).

    features: sequence of [H_l, W_l, C]; scales: matching spatial scales.
    Returns [N, P, P, C].
    """
    num_levels = len(scales)
    if num_levels == 1:
        return roi_align(features[0], boxes, scales[0], output_size, sampling_ratio, roi_chunk=roi_chunk)

    k_min = int(-math.log2(scales[0]))
    k_max = int(-math.log2(scales[-1]))
    levels = assign_levels(boxes, k_min, k_max)  # [N]

    out = None
    for lvl, (feat, scale) in enumerate(zip(features, scales)):
        pooled = roi_align(feat, boxes, scale, output_size, sampling_ratio, roi_chunk=roi_chunk)
        sel = (levels == lvl).astype(pooled.dtype)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out
