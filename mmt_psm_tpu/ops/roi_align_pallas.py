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

Gradients: custom VJP — the backward is a second Pallas kernel running
the SAME window schedule in transpose: per RoI two MXU contractions
(``Ay^T @ g @ Ax`` into a window-local f32 accumulator), per distinct
window one read-modify-write DMA round trip into the HBM-resident
gradient maps (the TPU analog of ROIAlign_cuda.cu:123-200's atomic
scatter; sequential grid steps make RMW race-free). The dense
linear_transpose is kept as BACKWARD_IMPL="dense" (oracle/fallback).
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


def _window_plan(shapes, boxes, scales: tuple, output_size: int, sampling_ratio: int, window: int, align: int = 8):
    """Shared forward/backward schedule: window assignment, sort by
    window identity, interpolation matrices.

    Window starts are aligned down to multiples of ``align`` (>= 8:
    the x start because HBM sublane tiling requires it, both so that
    overlapping RoIs land on IDENTICAL windows) and the windows widened
    by ``align`` to cover the alignment slack. RoIs are then sorted by
    window identity and consecutive duplicates reuse the VMEM-resident
    window without a new DMA — on clustered detections (the pap
    regime: ~15 proposals per cell) this removes most of the HBM
    traffic, which dominates the kernel. Coarser ``align`` trades a
    bigger window (more bytes per DMA) for fewer distinct windows
    (more sharing); the pooled values are EXACT for any align — the
    interpolation matrices are window-local (scripts/window_stats.py
    measures the traffic trade on real proposal sets).

    shapes: per-level static [B, H_l, W_l, C] shapes; boxes: [B, N, 4].
    Returns (meta [6, M] i32, ay/ax [M, P, W] f32, order [M], pad_hw).
    """
    assert align % 8 == 0 and align >= 8, align
    num_levels = len(shapes)
    bsz, n = boxes.shape[:2]
    m = bsz * n
    window_y = window + align
    window_x = window + align
    # small top levels are padded so a full window always fits; weights
    # never reference rows/cols beyond the true extent, so pads are dead
    pad_hw = [(max(window_y, s[1]), max(window_x, s[2])) for s in shapes]

    flat_boxes = boxes.reshape(m, 4)
    k_min = int(-math.log2(scales[0]))
    k_max = int(-math.log2(scales[-1]))
    if num_levels > 1:
        levels = assign_levels(flat_boxes, k_min, k_max)
    else:
        levels = jnp.zeros(m, jnp.int32)

    scales_arr = jnp.asarray(scales, jnp.float32)
    heights = jnp.asarray([s[1] for s in shapes], jnp.int32)
    widths = jnp.asarray([s[2] for s in shapes], jnp.int32)
    pad_h = jnp.asarray([p[0] for p in pad_hw], jnp.int32)
    pad_w = jnp.asarray([p[1] for p in pad_hw], jnp.int32)

    scale = scales_arr[levels]
    h = heights[levels]
    w = widths[levels]
    sx = flat_boxes[:, 0] * scale
    sy = flat_boxes[:, 1] * scale
    rw = jnp.maximum(flat_boxes[:, 2] * scale - sx, 1.0)
    rh = jnp.maximum(flat_boxes[:, 3] * scale - sy, 1.0)
    oy = jnp.clip(jnp.floor(sy) - 1, 0, (pad_h[levels] - window_y).astype(jnp.float32)).astype(jnp.int32)
    ox = jnp.clip(jnp.floor(sx) - 1, 0, (pad_w[levels] - window_x).astype(jnp.float32)).astype(jnp.int32)
    oy = (oy // align) * align  # aligned starts: DMA tiling + window identity
    ox = (ox // align) * align
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
    )
    ax = _axis_weights_batch(
        sx[order], rw[order], output_size, sampling_ratio, wf, oxf, window_x
    )
    return meta, ay, ax, order, pad_hw, window_y, window_x


@functools.partial(
    jax.jit,
    static_argnames=("scales", "output_size", "sampling_ratio", "window", "align", "interpret"),
)
def _pallas_pool(
    features,
    boxes,
    scales: tuple,
    output_size: int,
    sampling_ratio: int,
    window: int,
    align: int,
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

    meta, ay, ax, order, pad_hw, window_y, window_x = _window_plan(
        tuple(f.shape for f in features), boxes, scales, output_size, sampling_ratio, window, align
    )
    ay = ay.astype(dtype)
    ax = ax.astype(dtype)
    feats = []
    for f, (ph, pw) in zip(features, pad_hw):
        if ph > f.shape[1] or pw > f.shape[2]:
            f = jnp.pad(f, ((0, 0), (0, ph - f.shape[1]), (0, pw - f.shape[2]), (0, 0)))
        feats.append(f)

    kernel = _make_kernel(num_levels, output_size, window_y, window_x, c, dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, output_size, window_y), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, output_size, window_x), lambda i, *_: (i, 0, 0)),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_levels)],
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


def _make_bwd_kernel(
    num_levels: int, pooled: int, window_y: int, window_x: int, c: int, dtype,
    interpret: bool = False,
):
    """Windowed scatter-add backward: the exact transpose of the forward
    kernel (TPU analog of the reference's atomic scatter backward,
    csrc/cuda/ROIAlign_cuda.cu:123-200). Grid steps run sequentially on
    the TPU core, so read-modify-write flushes of (potentially
    overlapping) windows into the HBM-resident gradient maps are
    race-free as long as each write is awaited before the next group's
    read starts — which the flush structure below guarantees."""
    f32 = jnp.float32

    def kernel(meta_ref, ay_ref, ax_ref, g_ref, *rest):
        # rest = [aliased zero-input refs x L, output refs x L, scratch];
        # the inputs are donated as the outputs, so only the output refs
        # are touched
        out_refs = rest[num_levels : 2 * num_levels]
        acc = rest[2 * num_levels]  # [Wy, Wx, C] f32 accumulator
        rbuf = rest[2 * num_levels + 1]  # [Wy, Wx, C] dtype, read-back
        wbuf = rest[2 * num_levels + 2]  # [Wy, Wx, C] dtype, write-out
        rsem = rest[2 * num_levels + 3]
        wsem = rest[2 * num_levels + 4]

        i = pl.program_id(0)
        m = pl.num_programs(0)

        def dma(j, buf, sem, to_hbm: bool):
            lvl = meta_ref[0, j]
            b = meta_ref[1, j]
            oy = meta_ref[2, j]
            ox = meta_ref[3, j]
            out = []
            for k in range(num_levels):
                def mk(orf=out_refs[k], b=b, oy=oy, ox=ox):
                    region = orf.at[
                        b,
                        pl.ds(pl.multiple_of(oy, 8), window_y),
                        pl.ds(pl.multiple_of(ox, 8), window_x),
                        :,
                    ]
                    if to_hbm:
                        return pltpu.make_async_copy(buf, region, sem)
                    return pltpu.make_async_copy(region, buf, sem)

                out.append((lvl == k, mk))
            return out

        # first roi of a window group: start the read of the current
        # accumulated HBM contents (the previous group's write was
        # awaited at its flush, so overlapping regions are consistent)
        @pl.when(meta_ref[4, i] == 1)
        def _():
            for cond, mk in dma(i, rbuf, rsem, to_hbm=False):
                @pl.when(cond)
                def _(mk=mk):
                    mk().start()

        # dw[y, x, c] = sum_{qy,qx} ay[qy, y] g[qy, qx, c] ax[qx, x]
        # (interpret mode upcasts: the XLA CPU thunk can't execute
        # bf16 x bf16 -> f32 dots; on TPU the MXU does exactly that)
        cast = (lambda x: x.astype(f32)) if interpret else (lambda x: x)
        gq = g_ref[0].reshape(pooled, pooled, c)
        t1 = jax.lax.dot_general(
            cast(ax_ref[0]), cast(gq), (((0,), (1,)), ((), ())), preferred_element_type=f32
        )  # [Wx, P(qy), C]
        dw = jax.lax.dot_general(
            cast(ay_ref[0]), t1, (((0,), (1,)), ((), ())), preferred_element_type=f32
        )  # [Wy, Wx, C]

        @pl.when(meta_ref[4, i] == 1)
        def _():
            acc[...] = dw

        @pl.when(meta_ref[4, i] == 0)
        def _():
            acc[...] = acc[...] + dw

        # flush at the last roi of the group: read-back + add + write,
        # fully awaited so the next group's read observes this write
        nxt = jnp.minimum(i + 1, m - 1)
        flush = (i == m - 1) | (meta_ref[4, nxt] == 1)

        @pl.when(flush)
        def _():
            for cond, mk in dma(i, rbuf, rsem, to_hbm=False):
                @pl.when(cond)
                def _(mk=mk):
                    mk().wait()
            wbuf[...] = (acc[...] + rbuf[...].astype(f32)).astype(dtype)
            for cond, mk in dma(i, wbuf, wsem, to_hbm=True):
                @pl.when(cond)
                def _(mk=mk):
                    mk().start()
            for cond, mk in dma(i, wbuf, wsem, to_hbm=True):
                @pl.when(cond)
                def _(mk=mk):
                    mk().wait()

    return kernel


def _pallas_pool_bwd(
    shapes,
    dtypes,
    boxes,
    g,
    scales: tuple,
    output_size: int,
    sampling_ratio: int,
    window: int,
    align: int,
    interpret: bool,
):
    """Transpose of _pallas_pool: scatter the pooled cotangent g
    [B, N, P, P, C] back into per-level feature gradients.

    shapes/dtypes: static per-level [B, H_l, W_l, C] shapes and dtypes.
    Runs the same window schedule as the forward; per distinct window
    one read-modify-write round trip (instead of the dense transpose's
    O(sum_l H_l W_l C) contraction per RoI)."""
    num_levels = len(shapes)
    bsz, n = boxes.shape[:2]
    c = shapes[0][-1]
    dtype = dtypes[0]
    m = bsz * n

    meta, ay, ax, order, pad_hw, window_y, window_x = _window_plan(
        shapes, boxes, scales, output_size, sampling_ratio, window, align
    )
    ay = ay.astype(dtype)
    ax = ax.astype(dtype)
    g_sorted = g.reshape(m, output_size * output_size, c)[order].astype(dtype)

    zeros = [
        jnp.zeros((s[0], ph, pw, c), dt)
        for s, dt, (ph, pw) in zip(shapes, dtypes, pad_hw)
    ]
    kernel = _make_bwd_kernel(
        num_levels, output_size, window_y, window_x, c, dtype, interpret
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, output_size, window_y), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, output_size, window_x), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, output_size * output_size, c), lambda i, *_: (i, 0, 0)),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_levels)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_levels)],
        scratch_shapes=[
            pltpu.VMEM((window_y, window_x, c), jnp.float32),
            pltpu.VMEM((window_y, window_x, c), dtype),
            pltpu.VMEM((window_y, window_x, c), dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    bytes_per_roi = window_y * window_x * c * jnp.dtype(dtype).itemsize
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s[0], ph, pw, c), dt)
            for s, dt, (ph, pw) in zip(shapes, dtypes, pad_hw)
        ],
        # inputs: meta(0), ay(1), ax(2), g(3), zeros_l0(4).. — the zero
        # level buffers are donated as the outputs (in-place RMW)
        input_output_aliases={4 + k: k for k in range(num_levels)},
        cost_estimate=pl.CostEstimate(
            flops=2 * m * (output_size * window_x * c + output_size**2 * window_y * c),
            bytes_accessed=2 * m * bytes_per_roi,
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta, ay, ax, g_sorted, *zeros)
    return tuple(
        o[:, : s[1], : s[2], :] if (o.shape[1] != s[1] or o.shape[2] != s[2]) else o
        for o, s in zip(outs, shapes)
    )


def _dense_pool(features, boxes, scales, output_size, sampling_ratio):
    """Exact full-map reference formulation (for the backward pass)."""
    from .pooler import multilevel_roi_align

    def one(img_feats, img_boxes):
        return multilevel_roi_align(
            list(img_feats), img_boxes, list(scales), output_size, sampling_ratio
        )

    return jax.vmap(one)(tuple(features), boxes)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7)
)
def multilevel_roi_align_pallas(
    features,
    boxes,
    scales: tuple,
    output_size: int,
    sampling_ratio: int,
    window: int = 48,
    align: int = 8,
    interpret: bool = False,
):
    """Batched multi-level ROIAlign on the Pallas windowed-gather kernel.

    features: tuple of per-level [B, H_l, W_l, C]; boxes: [B, N, 4].
    Returns [B, N, P, P, C]. Gradients (training) flow through the
    exact dense formulation; values agree wherever the window covers the
    RoI support (always, for level-mapper-consistent boxes).
    """
    return _pallas_pool(
        tuple(features), boxes, tuple(scales), output_size, sampling_ratio, window, align, interpret
    )


def _fwd(features, boxes, scales, output_size, sampling_ratio, window, align, interpret):
    out = _pallas_pool(
        tuple(features), boxes, tuple(scales), output_size, sampling_ratio, window, align, interpret
    )
    return out, (tuple(features), boxes)


# Backward implementation selector: "windowed" = the Pallas RMW
# scatter-add kernel (exact transpose of the forward); "dense" = the
# linear_transpose of the full-map formulation (slower — O(sum_l
# H_l W_l C) per RoI — kept as the parity oracle and fallback).
BACKWARD_IMPL = "windowed"


def _bwd_dense(scales, output_size, sampling_ratio, res, g):
    features, boxes = res
    # ROIAlign is linear in the features (the interpolation matrices
    # depend only on the boxes), so the cotangent is the pure transpose
    # of the dense formulation. linear_transpose evaluates ONLY the
    # transposed jaxpr — unlike jax.vjp, which would re-run the full
    # dense forward (~3x the FLOPs) just to throw its primal away.
    transpose = jax.linear_transpose(
        lambda f: _dense_pool(f, boxes, scales, output_size, sampling_ratio), features
    )
    return transpose(g)[0]


def _bwd(scales, output_size, sampling_ratio, window, align, interpret, res, g):
    if BACKWARD_IMPL == "dense":
        return _bwd_dense(scales, output_size, sampling_ratio, res, g), None
    features, boxes = res
    # only shapes/dtypes of the residual features are read — their
    # values are dead here and XLA DCEs the dependency
    grads = _pallas_pool_bwd(
        tuple(f.shape for f in features),
        tuple(f.dtype for f in features),
        boxes,
        g,
        scales,
        output_size,
        sampling_ratio,
        window,
        align,
        interpret,
    )
    return grads, None


multilevel_roi_align_pallas.defvjp(_fwd, _bwd)
