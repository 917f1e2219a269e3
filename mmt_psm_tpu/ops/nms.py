"""Fixed-shape greedy NMS for TPU.

The reference uses a CUDA bitmask-block kernel plus host greedy scan
(reference: maskrcnn_benchmark/csrc/cuda/nms.cu:23-131) and a serial CPU
version (csrc/cpu/nms_cpu.cpp:37-63), both returning a dynamic number of
kept indices. XLA needs static shapes, so here NMS returns a fixed-size
index buffer + validity mask, computed entirely on device:

* boxes are sorted by score once,
* greedy suppression runs tile-by-tile: within a tile the greedy
  fixpoint is found by (exact) Jacobi iteration under ``lax.while_loop``;
  the tile's survivors then suppress all later boxes with one masked
  matrix op. This keeps sequential steps at O(N / TILE) instead of O(N).

Semantics match the reference exactly: +1 area convention and
suppression when IoU >= threshold (nms_cpu.cpp:56-61).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..structures.boxes import box_iou

NEG_INF = -1e30


def _sort_by_score(boxes, scores, valid):
    scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)  # stable; ties keep original index order
    return boxes[order], scores[order], valid[order], order


def nms_mask_reference(boxes, scores, valid, iou_threshold: float):
    """O(N) sequential-greedy oracle (used in tests; same API as nms_mask)."""
    n = boxes.shape[0]
    boxes_s, _, valid_s, order = _sort_by_score(boxes, scores, valid)
    iou = box_iou(boxes_s, boxes_s)
    idx = jnp.arange(n)

    def body(i, supp):
        row = (iou[i] >= iou_threshold) & (idx > i)
        alive = jnp.logical_not(supp[i]) & valid_s[i]
        return supp | (row & alive)

    supp = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    keep_sorted = jnp.logical_not(supp) & valid_s
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def _use_pallas() -> bool:
    """Pallas NMS runs on real TPU backends (measured ~30x faster than
    the XLA loop); CPU (tests, dryrun meshes) uses the XLA path."""
    import os

    impl = os.environ.get("MMT_PSM_NMS_IMPL", "auto")
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@partial(jax.jit, static_argnames=("iou_threshold", "tile"))
def nms_mask(boxes, scores, valid, iou_threshold: float, tile: int = 128):
    """Exact greedy NMS keep-mask.

    Args:
      boxes:  f32[N, 4] xyxy (padding rows arbitrary).
      scores: f32[N].
      valid:  bool[N] — padding mask; invalid rows are never kept.
      iou_threshold: suppress j when IoU(i, j) >= threshold for a kept
        higher-scored i.
      tile: static tile size for the blocked scan.

    Returns:
      bool[N] keep mask in the *original* box order.
    """
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), bool)
    if _use_pallas():
        from .nms_pallas import nms_mask_pallas

        return nms_mask_pallas(boxes, scores, valid, iou_threshold, tile=tile)
    pad = (-n) % tile
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, pad),), constant_values=NEG_INF)
        valid = jnp.pad(valid, ((0, pad),))
    m = boxes.shape[0]
    boxes_s, _, valid_s, order = _sort_by_score(boxes, scores, valid)

    num_tiles = m // tile
    idx_in_tile = jnp.arange(tile)
    # strictly-lower-triangular within-tile mask (i suppresses j only if i<j)
    tril = idx_in_tile[:, None] < idx_in_tile[None, :]

    def tile_body(t, supp):
        start = t * tile
        tb = jax.lax.dynamic_slice(boxes_s, (start, 0), (tile, 4))
        tsupp = jax.lax.dynamic_slice(supp, (start,), (tile,))
        tvalid = jax.lax.dynamic_slice(valid_s, (start,), (tile,))
        iou_tt = box_iou(tb, tb)
        sup_rel = (iou_tt >= iou_threshold) & tril  # [tile, tile]

        # Jacobi iteration to the greedy fixpoint within the tile:
        # j is suppressed iff some alive i<j (not suppressed, valid) covers it.
        def cond(state):
            cur, changed = state
            return changed

        def step(state):
            cur, _ = state
            alive = jnp.logical_not(cur) & tvalid
            new = tsupp | jnp.any(sup_rel & alive[:, None], axis=0)
            return new, jnp.any(new != cur)

        tsupp_final, _ = jax.lax.while_loop(cond, step, (tsupp, jnp.array(True)))

        supp = jax.lax.dynamic_update_slice(supp, tsupp_final, (start,))

        # Tile survivors suppress all strictly-later boxes in one shot.
        survivors = jnp.logical_not(tsupp_final) & tvalid  # [tile]
        iou_tn = box_iou(tb, boxes_s)  # [tile, m]
        later = jnp.arange(m) >= start + tile
        hit = jnp.any((iou_tn >= iou_threshold) & survivors[:, None], axis=0)
        return supp | (hit & later)

    supp = jax.lax.fori_loop(0, num_tiles, tile_body, jnp.zeros((m,), bool))
    keep_sorted = jnp.logical_not(supp) & valid_s
    keep = jnp.zeros((m,), bool).at[order].set(keep_sorted)
    return keep[:n]


def nms_topk(boxes, scores, valid, iou_threshold: float, max_out: int, tile: int = 128):
    """NMS returning the top ``max_out`` kept entries in score order.

    Returns (indices i32[max_out] into the input, valid_out bool[max_out]).
    Padding slots hold index 0 with valid_out=False.
    """
    keep = nms_mask(boxes, scores, valid, iou_threshold, tile=tile)
    kept_scores = jnp.where(keep, scores, NEG_INF)
    k = min(max_out, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(kept_scores, k)
    if k < max_out:
        top_scores = jnp.pad(top_scores, (0, max_out - k), constant_values=NEG_INF)
        top_idx = jnp.pad(top_idx, (0, max_out - k))
    valid_out = top_scores > NEG_INF / 2
    return top_idx.astype(jnp.int32), valid_out
