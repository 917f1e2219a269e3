"""Pallas TPU kernel for greedy NMS suppression.

The XLA implementation (ops/nms.py) runs the tile scan as a
``fori_loop`` + ``while_loop`` nest — every sequential step is a
separate XLA loop iteration with HBM round-trips for the suppression
state. This kernel keeps the sorted boxes and the suppression mask
resident in VMEM and runs the whole greedy scan inside one Pallas
program: per 128-box tile, an in-register Jacobi fixpoint resolves
intra-tile suppression, then a column-CHUNKED IoU pass suppresses
later boxes (same exact-greedy algorithm, zero loop-boundary
overhead). Chunking bounds live VMEM at O(tile x chunk) regardless of
N — the original [tile, N] pass materialized ~6 [128, N] f32 buffers,
which blew VMEM at the C4 config's single-level 12k-proposal width —
and skips columns earlier than the tile entirely (the [tile, N]
version computed them and masked, ~2x wasted IoU work).

Semantics identical to ops/nms.py / the reference kernels
(csrc/cpu/nms_cpu.cpp:37-63): +1 area convention, suppress at
IoU >= threshold. Inputs must be pre-sorted by descending score with
invalid rows pushed to the end (ops/nms.py handles sorting; see
``nms_mask_pallas`` below for the drop-in wrapper).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


try:  # pallas import is deferred-safe for environments without TPU support
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

NEG_INF = -1e30


def _nms_kernel(boxes_ref, valid_ref, out_ref, *, iou_threshold: float, tile: int, chunk: int):
    """boxes_ref: [N, 4] f32 sorted by score desc; valid_ref: [N, 1] f32
    (1 valid); out_ref: [N, 1] f32 suppression flags (1 = suppressed).

    All dynamic indexing goes through refs with pl.ds (Mosaic has no
    value-level dynamic_slice); the running suppression state lives in
    out_ref itself. N must be a multiple of ``chunk`` and ``chunk`` a
    multiple of ``tile`` (nms_suppress_pallas pads accordingly).
    """
    n = boxes_ref.shape[0]
    num_tiles = n // tile
    num_chunks = n // chunk

    out_ref[:] = jnp.zeros((n, 1), jnp.float32)

    tile_pos = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)[:, 0]
    tril = tile_pos[:, None] < tile_pos[None, :]
    chunk_pos = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]

    def tile_body(t, carry):
        start = pl.multiple_of(t * tile, tile)
        tb = boxes_ref[pl.ds(start, tile), :]  # [tile, 4]
        tvalid = valid_ref[pl.ds(start, tile), :][:, 0] > 0.5
        tsupp0 = out_ref[pl.ds(start, tile), :][:, 0]

        bx1, by1, bx2, by2 = tb[:, 0], tb[:, 1], tb[:, 2], tb[:, 3]
        ba = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)

        # within-tile IoU [tile, tile]
        ww = jnp.maximum(jnp.minimum(bx2[:, None], bx2[None, :]) - jnp.maximum(bx1[:, None], bx1[None, :]) + 1.0, 0.0)
        hh = jnp.maximum(jnp.minimum(by2[:, None], by2[None, :]) - jnp.maximum(by1[:, None], by1[None, :]) + 1.0, 0.0)
        inter_tt = ww * hh
        iou_tt = inter_tt / jnp.maximum(ba[:, None] + ba[None, :] - inter_tt, 1e-10)
        sup_rel = jnp.logical_and(iou_tt >= iou_threshold, tril)

        def fix_cond(state):
            return state[1]

        def fix_step(state):
            cur, _ = state
            alive = jnp.logical_and(jnp.logical_not(cur > 0.5), tvalid)
            new = jnp.maximum(
                tsupp0,
                jnp.any(jnp.logical_and(sup_rel, alive[:, None]), axis=0).astype(jnp.float32),
            )
            return new, jnp.any(new != cur)

        tsupp, _ = jax.lax.while_loop(fix_cond, fix_step, (tsupp0, jnp.array(True)))

        survivors = jnp.logical_and(jnp.logical_not(tsupp > 0.5), tvalid)

        # suppress later boxes, one [tile, chunk] IoU block at a time —
        # only chunks containing columns >= start + tile are visited
        def chunk_body(u, c2):
            cstart = pl.multiple_of(u * chunk, chunk)
            cb = boxes_ref[pl.ds(cstart, chunk), :]  # [chunk, 4]
            cx1, cy1, cx2, cy2 = cb[:, 0], cb[:, 1], cb[:, 2], cb[:, 3]
            ca = (cx2 - cx1 + 1.0) * (cy2 - cy1 + 1.0)
            w = jnp.maximum(jnp.minimum(bx2[:, None], cx2[None, :]) - jnp.maximum(bx1[:, None], cx1[None, :]) + 1.0, 0.0)
            h = jnp.maximum(jnp.minimum(by2[:, None], cy2[None, :]) - jnp.maximum(by1[:, None], cy1[None, :]) + 1.0, 0.0)
            inter = w * h
            iou_tc = inter / jnp.maximum(ba[:, None] + ca[None, :] - inter, 1e-10)
            hit = jnp.any(jnp.logical_and(iou_tc >= iou_threshold, survivors[:, None]), axis=0)
            later = (cstart + chunk_pos) >= start + tile
            cur = out_ref[pl.ds(cstart, chunk), :][:, 0]
            new = jnp.maximum(cur, jnp.logical_and(hit, later).astype(jnp.float32))
            out_ref[pl.ds(cstart, chunk), :] = new[:, None]
            return c2

        jax.lax.fori_loop((start + tile) // chunk, num_chunks, chunk_body, 0)
        out_ref[pl.ds(start, tile), :] = tsupp[:, None]
        return carry

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "tile", "chunk", "interpret"))
def nms_suppress_pallas(boxes_sorted, valid_sorted, iou_threshold: float, tile: int = 128, chunk: int = 1024, interpret: bool = False):
    """Suppression flags [N] (1 = suppressed) for score-sorted boxes.

    ``chunk`` bounds the later-pass block to [tile, chunk] so VMEM use
    is independent of N (1024 -> ~2 MB of live blocks). ``chunk`` is a
    ceiling: N splits into k = ceil(N_tile/chunk) EQUAL tile-aligned
    chunks (chunk := ceil(N_tile/k) tile-rounded), so padding never
    exceeds (k-1)·(tile-1) rows — naively padding N up to a chunk
    multiple would nearly double the kernel work for N just past a
    chunk boundary (1025 -> 2048). Padding rows are invalid and cannot
    suppress anything.
    """
    n = boxes_sorted.shape[0]
    m_tile = n + ((-n) % tile)
    chunk = max(tile, (chunk // tile) * tile)
    k = -(-m_tile // chunk)  # chunks needed at the requested ceiling
    chunk = -(-(-(-m_tile // k)) // tile) * tile  # ceil(m_tile/k), tile-aligned
    pad = k * chunk - n
    assert chunk % tile == 0 and pad < k * tile + tile
    if pad:
        boxes_sorted = jnp.pad(boxes_sorted, ((0, pad), (0, 0)))
        valid_sorted = jnp.pad(valid_sorted, ((0, pad),))
    m = boxes_sorted.shape[0]
    out = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold=iou_threshold, tile=tile, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes_sorted.astype(jnp.float32), valid_sorted.astype(jnp.float32)[:, None])
    return out[:n, 0]


def nms_mask_pallas(boxes, scores, valid, iou_threshold: float, tile: int = 128, interpret: bool = False):
    """Drop-in replacement for ops.nms.nms_mask using the Pallas kernel."""
    scores_m = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores_m)
    boxes_s = boxes[order]
    valid_s = valid[order]
    supp = nms_suppress_pallas(boxes_s, valid_s, iou_threshold, tile=tile, interpret=interpret)
    keep_sorted = jnp.logical_and(supp < 0.5, valid_s)
    n = boxes.shape[0]
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)
