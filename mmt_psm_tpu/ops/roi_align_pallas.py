"""Pallas TPU kernel for windowed multi-level ROIAlign.

The dense pooler (ops/roi_align.py) contracts every RoI against the
entire level map on every level — O(sum_l H_l W_l C) per RoI. The XLA
windowed variant (ops/roi_align_windowed.py) fixes the FLOP count but
pays for its crop with a 2304-row XLA gather per RoI that Mosaic/XLA
lowers as scalarized dynamic-slices. This kernel does the crop the way
the hardware wants it done:

* per RoI, one strided DMA brings the ``window x window x C`` support
  region from the HBM-resident level map into VMEM (double-buffered
  across grid steps, so the next RoI's window streams in while the
  current one is contracted);
* the separable interpolation matrices Ay/Ax ([P, window], same math as
  the reference ROIAlign_cpu.cpp:33-103 / ROIAlign_cuda.cu:65-120 —
  in-bounds zeroing, 0-clamp, edge collapse, 1/G averaging) are built
  in-register on the VPU;
* the pooled output is two MXU contractions:
  ``Ay @ win[WIN, WIN*C]`` then ``Ax @ tmp`` (f32 accumulation).

Exactness matches ops/roi_align_windowed.py: identical to the reference
kernel whenever the RoI's bilinear support fits the window (the FPN
level mapper guarantees span <= 28*sqrt(aspect) cells on the assigned
level — aspect <= ~2.7 at window=48); oversized RoIs clamp their
outermost samples to the window edge.

Gradients: custom VJP — backward runs through the exact dense
formulation (only taken in training; inference is the hot path).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

try:  # pallas import is deferred-safe for environments without TPU support
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

from .pooler import assign_levels


def _iota(n):
    # Mosaic's tpu.iota is integer-only; cast after
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0].astype(jnp.float32)


def _axis_weights_kernel(start, size, pooled: int, grid: int, dim, origin, window: int):
    """[pooled, window] f32 interpolation matrix, window-local columns.

    Same math as roi_align._axis_weights; ``dim`` (true level extent,
    f32) and ``origin`` (window start, f32) are traced scalars. Uses
    broadcasted_iota throughout (TPU kernels reject 1-D iota).
    """
    bin_size = size / pooled
    p = _iota(pooled)[:, None]  # [P, 1]
    i = _iota(grid)[None, :]  # [1, G]
    coord = start + p * bin_size + (i + 0.5) * bin_size / grid  # [P, G]

    inb = (coord >= -1.0) & (coord <= dim)
    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c)
    at_edge = low >= dim - 1.0
    low = jnp.where(at_edge, dim - 1.0, low)
    frac = jnp.where(at_edge, 0.0, c - low)
    high = jnp.where(at_edge, low, low + 1.0)

    w_low = jnp.where(inb, 1.0 - frac, 0.0) / grid  # [P, G]
    w_high = jnp.where(inb, frac, 0.0) / grid

    rel = jax.lax.broadcasted_iota(jnp.int32, (pooled, grid, window), 2).astype(jnp.float32)
    low_rel = jnp.clip(low - origin, 0.0, window - 1.0)
    high_rel = jnp.clip(high - origin, 0.0, window - 1.0)
    a = w_low[..., None] * (low_rel[..., None] == rel) + w_high[..., None] * (
        high_rel[..., None] == rel
    )
    return jnp.sum(a, axis=1)  # [P, window]


def _make_kernel(num_levels: int, pooled: int, window: int, window_x: int, c: int, dtype):
    f32 = jnp.float32

    def kernel(meta_ref, ay_ref, ax_ref, *rest):
        feat_refs = rest[:num_levels]
        out_ref = rest[num_levels]
        win = rest[num_levels + 1]
        sem = rest[num_levels + 2]

        i = pl.program_id(0)
        m = pl.num_programs(0)

        def dma(j):
            """The window copy descriptor for roi j (same shape at every
            level, so start/wait pairs reconstruct identically). RoIs are
            pre-sorted by window identity; meta row 4 flags the first roi
            of each distinct window, row 5 carries its buffer slot."""
            lvl = meta_ref[0, j]
            b = meta_ref[1, j]
            oy = meta_ref[2, j]
            ox = meta_ref[3, j]
            slot = meta_ref[5, j]
            out = []
            for k in range(num_levels):
                out.append(
                    (
                        lvl == k,
                        lambda fr=feat_refs[k]: pltpu.make_async_copy(
                            fr.at[
                                b,
                                pl.ds(pl.multiple_of(oy, 8), window),
                                pl.ds(pl.multiple_of(ox, 8), window_x),
                                :,
                            ],
                            win.at[slot],
                            sem.at[slot],
                        ),
                    )
                )
            return out

        @pl.when((i == 0) & (meta_ref[4, 0] == 1))
        def _():
            for cond, mk in dma(0):
                @pl.when(cond)
                def _(mk=mk):
                    mk().start()

        @pl.when((i + 1 < m) & (meta_ref[4, i + 1] == 1))
        def _():
            for cond, mk in dma(i + 1):
                @pl.when(cond)
                def _(mk=mk):
                    mk().start()

        slot = meta_ref[5, i]
        # the window for a repeated roi was awaited when first loaded
        @pl.when(meta_ref[4, i] == 1)
        def _():
            for cond, mk in dma(i):
                @pl.when(cond)
                def _(mk=mk):
                    mk().wait()

        data = win[slot].reshape(window, window_x * c)
        tmp = jax.lax.dot_general(
            ay_ref[0],
            data,
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(pooled, window_x, c)
        # out[q, p, c] = sum_w ax[q, w] tmp[p, w, c]
        o = jax.lax.dot_general(
            ax_ref[0].astype(f32),
            tmp,
            (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # [P(x), P(y), C]
        out_ref[0] = jnp.transpose(o, (1, 0, 2)).reshape(pooled * pooled, c).astype(dtype)

    return kernel


def _axis_weights_batch(start, size, pooled: int, grid: int, dim, origin, window: int):
    """Vectorized [M, pooled, window] interpolation matrices (XLA-side;
    same math as roi_align._axis_weights / the in-kernel variant this
    replaces — building weights on the VPU per grid step cost ~1us/roi).
    start/size/dim/origin: [M] f32."""
    f32 = jnp.float32
    start = start[:, None, None]
    dim = dim[:, None, None]
    origin = origin[:, None, None]
    bin_size = (size / pooled)[:, None, None]
    p = jnp.arange(pooled, dtype=f32)[None, :, None]
    i = jnp.arange(grid, dtype=f32)[None, None, :]
    coord = start + p * bin_size + (i + 0.5) * bin_size / grid  # [M, P, G]

    inb = (coord >= -1.0) & (coord <= dim)
    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c)
    at_edge = low >= dim - 1.0
    low = jnp.where(at_edge, dim - 1.0, low)
    frac = jnp.where(at_edge, 0.0, c - low)
    high = jnp.where(at_edge, low, low + 1.0)

    w_low = jnp.where(inb, 1.0 - frac, 0.0) / grid
    w_high = jnp.where(inb, frac, 0.0) / grid

    rel = jnp.arange(window, dtype=f32)
    low_rel = jnp.clip(low - origin, 0.0, window - 1.0)
    high_rel = jnp.clip(high - origin, 0.0, window - 1.0)
    a = w_low[..., None] * (low_rel[..., None] == rel) + w_high[..., None] * (
        high_rel[..., None] == rel
    )
    return jnp.sum(a, axis=2)  # [M, P, window]


@functools.partial(
    jax.jit,
    static_argnames=("scales", "output_size", "sampling_ratio", "window", "interpret"),
)
def _pallas_pool(
    features,
    boxes,
    scales: tuple,
    output_size: int,
    sampling_ratio: int,
    window: int,
    interpret: bool,
):
    """features: tuple of [B, H_l, W_l, C]; boxes: [B, N, 4] image
    coords. Returns [B, N, P, P, C]."""
    assert sampling_ratio > 0, "adaptive sampling_ratio not supported (pap configs use 2)"
    num_levels = len(features)
    bsz, n = boxes.shape[:2]
    c = features[0].shape[-1]
    dtype = features[0].dtype
    m = bsz * n

    # Window starts are aligned down to multiples of 8 (the x start
    # because HBM sublane tiling requires it, both so that overlapping
    # RoIs land on IDENTICAL windows) and the windows widened by 8 to
    # cover the alignment slack. RoIs are then sorted by window
    # identity and consecutive duplicates reuse the VMEM-resident
    # window without a new DMA — on clustered detections (the pap
    # regime: ~15 proposals per cell) this removes most of the HBM
    # traffic, which dominates the kernel.
    window_y = window + 8
    window_x = window + 8

    # pad small top levels so a full window always fits; weights never
    # reference rows/cols beyond the true extent, so pad values are dead
    feats = []
    for f in features:
        ph = max(window_y - f.shape[1], 0)
        pw = max(window_x - f.shape[2], 0)
        if ph or pw:
            f = jnp.pad(f, ((0, 0), (0, ph), (0, pw), (0, 0)))
        feats.append(f)

    flat_boxes = boxes.reshape(m, 4)
    k_min = int(-math.log2(scales[0]))
    k_max = int(-math.log2(scales[-1]))
    if num_levels > 1:
        levels = assign_levels(flat_boxes, k_min, k_max)
    else:
        levels = jnp.zeros(m, jnp.int32)

    scales_arr = jnp.asarray(scales, jnp.float32)
    heights = jnp.asarray([f.shape[1] for f in features], jnp.int32)
    widths = jnp.asarray([f.shape[2] for f in features], jnp.int32)
    pad_h = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    pad_w = jnp.asarray([f.shape[2] for f in feats], jnp.int32)

    scale = scales_arr[levels]
    h = heights[levels]
    w = widths[levels]
    sx = flat_boxes[:, 0] * scale
    sy = flat_boxes[:, 1] * scale
    rw = jnp.maximum(flat_boxes[:, 2] * scale - sx, 1.0)
    rh = jnp.maximum(flat_boxes[:, 3] * scale - sy, 1.0)
    oy = jnp.clip(jnp.floor(sy) - 1, 0, (pad_h[levels] - window_y).astype(jnp.float32)).astype(jnp.int32)
    ox = jnp.clip(jnp.floor(sx) - 1, 0, (pad_w[levels] - window_x).astype(jnp.float32)).astype(jnp.int32)
    oy = (oy // 8) * 8  # 8-aligned starts: DMA tiling + window identity
    ox = (ox // 8) * 8
    b_idx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), n)

    # sort by window identity; first-of-window rois trigger the DMA,
    # repeats reuse the buffer (see kernel)
    key = ((b_idx * num_levels + levels) * 1024 + oy // 8) * 1024 + ox // 8
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    is_new = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (key_s[1:] != key_s[:-1]).astype(jnp.int32)]
    )
    slot = (jnp.cumsum(is_new) - 1) % 2

    # [fields, M] layout: SMEM pads the minor dim to 128 lanes, so the
    # roi axis must ride the lanes (a [M, 6] layout would need M*512 B)
    meta = jnp.stack([levels, b_idx, oy, ox], axis=0)[:, order]  # [4, M] i32
    meta = jnp.concatenate([meta, is_new[None], slot[None]], axis=0)  # [6, M]

    # interpolation matrices, vectorized XLA-side and streamed into the
    # kernel as auto-pipelined [1, P, W] blocks
    hf = h.astype(jnp.float32)[order]
    wf = w.astype(jnp.float32)[order]
    oyf = oy.astype(jnp.float32)[order]
    oxf = ox.astype(jnp.float32)[order]
    ay = _axis_weights_batch(
        sy[order], rh[order], output_size, sampling_ratio, hf, oyf, window_y
    ).astype(dtype)
    ax = _axis_weights_batch(
        sx[order], rw[order], output_size, sampling_ratio, wf, oxf, window_x
    ).astype(dtype)

    kernel = _make_kernel(num_levels, output_size, window_y, window_x, c, dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, output_size, window_y), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, output_size, window_x), lambda i, *_: (i, 0, 0)),
        ]
        + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(num_levels)],
        out_specs=pl.BlockSpec(
            (1, output_size * output_size, c), lambda i, *_: (i, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, window_y, window_x, c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    bytes_per_roi = window_y * window_x * c * jnp.dtype(dtype).itemsize
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, output_size * output_size, c), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * (output_size * window_y * window_x * c + output_size**2 * window_x * c),
            bytes_accessed=m * bytes_per_roi,
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta, ay, ax, *feats)
    inv = jnp.argsort(order)  # undo the window sort
    return out[inv].reshape(bsz, n, output_size, output_size, c)


def _dense_pool(features, boxes, scales, output_size, sampling_ratio):
    """Exact full-map reference formulation (for the backward pass)."""
    from .pooler import multilevel_roi_align

    def one(img_feats, img_boxes):
        return multilevel_roi_align(
            list(img_feats), img_boxes, list(scales), output_size, sampling_ratio
        )

    return jax.vmap(one)(tuple(features), boxes)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def multilevel_roi_align_pallas(
    features,
    boxes,
    scales: tuple,
    output_size: int,
    sampling_ratio: int,
    window: int = 48,
    interpret: bool = False,
):
    """Batched multi-level ROIAlign on the Pallas windowed-gather kernel.

    features: tuple of per-level [B, H_l, W_l, C]; boxes: [B, N, 4].
    Returns [B, N, P, P, C]. Gradients (training) flow through the
    exact dense formulation; values agree wherever the window covers the
    RoI support (always, for level-mapper-consistent boxes).
    """
    return _pallas_pool(
        tuple(features), boxes, tuple(scales), output_size, sampling_ratio, window, interpret
    )


def _fwd(features, boxes, scales, output_size, sampling_ratio, window, interpret):
    out = _pallas_pool(
        tuple(features), boxes, tuple(scales), output_size, sampling_ratio, window, interpret
    )
    return out, (tuple(features), boxes)


def _bwd(scales, output_size, sampling_ratio, window, interpret, res, g):
    features, boxes = res
    # ROIAlign is linear in the features (the interpolation matrices
    # depend only on the boxes), so the cotangent is the pure transpose
    # of the dense formulation. linear_transpose evaluates ONLY the
    # transposed jaxpr — unlike jax.vjp, which would re-run the full
    # dense forward (~3x the FLOPs) just to throw its primal away.
    transpose = jax.linear_transpose(
        lambda f: _dense_pool(f, boxes, scales, output_size, sampling_ratio), features
    )
    return transpose(g)[0], None


multilevel_roi_align_pallas.defvjp(_fwd, _bwd)
