"""ROIAlign for TPU.

Reimplements the reference's Caffe2-style ROIAlign (reference:
maskrcnn_benchmark/csrc/cpu/ROIAlign_cpu.cpp:17-215, CUDA twin
csrc/cuda/ROIAlign_cuda.cu:65-120) as a jittable XLA composition:

* "aligned=False" coordinate transform: roi coords are multiplied by
  ``spatial_scale`` with no half-pixel offset,
* roi sizes floored at 1.0,
* sampling grid point (iy, ix) at
  ``roi_start + p*bin + (i+0.5)*bin/grid``,
* samples with y or x outside [-1, size] contribute exactly 0,
* coords clamped at 0 below and edge-clamped above,
* output bin = mean over the grid samples.

The interpolation is *separable*: the zero/clamp conditions and the
bilinear weights each factor into a per-axis weight matrix, so one ROI's
output is ``Ay @ F @ Ax^T`` with Ay: [P, H], Ax: [P, W]. We build the
(dense, mostly-zero) per-axis weight matrices and contract them with the
feature map on the MXU — no gathers, no atomics, and the backward pass
falls out of autodiff as two more matmuls.

Gradients flow to ``features`` only (the reference kernel likewise has
no roi gradient).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _axis_weights(start, size, pooled: int, grid: int, dim: int, dtype):
    """Per-axis interpolation matrix A: [pooled, dim].

    A[p, d] = (1/grid) * sum_i w_bilinear(sample(p,i), d) * inbounds(sample),
    so that out[p] = sum_d A[p, d] * f[d] reproduces the reference kernel's
    per-axis math exactly (ROIAlign_cpu.cpp:33-103).

    Coordinate/weight math runs in f32 regardless of the feature dtype —
    bf16 coordinates both lose sampling precision (8 mantissa bits vs
    positions up to the map extent) and lower ~15x slower on the VPU
    (measured 80ms vs 5ms for the b8 x 1000-RoI production A-matrix
    build); only the final matrix is cast for the MXU contraction.
    """
    f32 = jnp.float32
    bin_size = jnp.asarray(size, f32) / pooled
    start = jnp.asarray(start, f32)
    p = jnp.arange(pooled, dtype=f32)[:, None]  # [P, 1]
    i = jnp.arange(grid, dtype=f32)[None, :]  # [1, G]
    coord = start + p * bin_size + (i + 0.5) * bin_size / grid  # [P, G]

    inb = (coord >= -1.0) & (coord <= dim)  # else contributes 0
    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c)
    # edge clamp: if low >= dim-1 then low = high = dim-1 and frac = 0
    at_edge = low >= dim - 1
    low = jnp.where(at_edge, dim - 1.0, low)
    frac = jnp.where(at_edge, 0.0, c - low)
    high = jnp.where(at_edge, low, low + 1.0)

    w_low = jnp.where(inb, 1.0 - frac, 0.0) / grid  # [P, G]
    w_high = jnp.where(inb, frac, 0.0) / grid

    onehot_low = jax.nn.one_hot(low.astype(jnp.int32), dim, dtype=f32)  # [P, G, D]
    onehot_high = jax.nn.one_hot(high.astype(jnp.int32), dim, dtype=f32)
    A = jnp.sum(w_low[..., None] * onehot_low + w_high[..., None] * onehot_high, axis=1)
    return A.astype(dtype)  # [P, D]


def _roi_weights(feat_hw, roi, spatial_scale, pooled: int, grid: int, dtype):
    """Per-roi separable interpolation matrices (Ay [P,H], Ax [P,W])."""
    h, w = feat_hw
    start_x = roi[0] * spatial_scale
    start_y = roi[1] * spatial_scale
    roi_w = jnp.maximum(roi[2] * spatial_scale - start_x, 1.0)
    roi_h = jnp.maximum(roi[3] * spatial_scale - start_y, 1.0)
    Ay = _axis_weights(start_y, roi_h, pooled, grid, h, dtype)
    Ax = _axis_weights(start_x, roi_w, pooled, grid, w, dtype)
    return Ay, Ax


def _roi_align_one(feat, roi, spatial_scale, pooled: int, grid: int):
    """feat: [H, W, C]; roi: [4] xyxy in input-image coords."""
    dtype = feat.dtype
    Ay, Ax = _roi_weights(feat.shape[:2], roi, spatial_scale, pooled, grid, dtype)
    # out[py, px, c] = sum_{h,w} Ay[py,h] Ax[px,w] feat[h,w,c]
    tmp = jnp.einsum("ph,hwc->pwc", Ay, feat, preferred_element_type=dtype)
    out = jnp.einsum("qw,pwc->pqc", Ax, tmp, preferred_element_type=dtype)
    return out  # [P, P, C]


def _roi_align_chunk(feat, rois, spatial_scale, pooled: int, grid: int):
    """Chunk-batched ROIAlign: the heavy first contraction is reshaped so
    the RoI chunk rides the matmul M dimension ([n*P, H] @ [H, W*C]) —
    full MXU rows instead of 7/128 utilization per thin per-roi matmul.
    feat: [H, W, C]; rois: [n, 4] -> [n, P, P, C]."""
    h, w, c = feat.shape
    dtype = feat.dtype
    Ay, Ax = jax.vmap(
        lambda r: _roi_weights((h, w), r, spatial_scale, pooled, grid, dtype)
    )(rois)  # [n, P, H], [n, P, W]
    n = rois.shape[0]
    tmp = jnp.dot(
        Ay.reshape(n * pooled, h), feat.reshape(h, w * c), preferred_element_type=dtype
    ).reshape(n, pooled, w, c)
    out = jnp.einsum("nqw,npwc->npqc", Ax, tmp, preferred_element_type=dtype)
    return out


@partial(jax.jit, static_argnames=("pooled_size", "sampling_ratio", "roi_chunk"))
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    pooled_size: int,
    sampling_ratio: int,
    roi_chunk: int = 1024,
) -> jnp.ndarray:
    """ROIAlign over one feature map.

    Args:
      features: f32/bf16 [H, W, C] (NHWC, single image).
      rois: f32 [N, 4] xyxy boxes in *input image* coordinates.
      spatial_scale: feature stride reciprocal (e.g. 0.25 for P2).
      pooled_size: output bins P (reference POOLER_RESOLUTION).
      sampling_ratio: grid samples per bin side; must be > 0 (the
        reference's adaptive ``ceil(roi/pooled)`` fallback for 0 is
        data-dependent and unsupported under jit; pap configs use 2).
      roi_chunk: rois processed per sequential step to bound memory.

    Returns:
      [N, P, P, C] pooled features.
    """
    assert sampling_ratio > 0, "sampling_ratio must be static and > 0 on TPU"
    n = rois.shape[0]
    # memory guard: the first contraction materializes
    # [chunk * P, W * C] — cap chunk so that stays ~O(500MB) at bf16
    # (e.g. res 14 with 1000+ RoIs would otherwise OOM at chunk 1024)
    roi_chunk = min(roi_chunk, max(128, 8192 // pooled_size))
    fn = partial(
        _roi_align_chunk,
        features,
        spatial_scale=spatial_scale,
        pooled=pooled_size,
        grid=sampling_ratio,
    )
    if n <= roi_chunk:
        return fn(rois)
    pad = (-n) % roi_chunk
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    chunks = rois_p.reshape(-1, roi_chunk, 4)
    out = jax.lax.map(fn, chunks)
    return out.reshape(-1, pooled_size, pooled_size, features.shape[-1])[:n]


def roi_align_batched(features, rois, batch_idx, spatial_scale, pooled_size, sampling_ratio):
    """ROIAlign where rois carry a batch index (reference's 5-column rois,
    ROIAlign_cpu.cpp:128-143). features: [B, H, W, C]."""
    feats = features[batch_idx]  # [N, H, W, C] gather per roi

    def one(feat, roi):
        return _roi_align_one(feat, roi, spatial_scale, pooled_size, sampling_ratio)

    return jax.vmap(one)(feats, rois)
