"""Fixed-shape box geometry.

The reference wraps boxes in a dynamic-length ``BoxList``
(reference: maskrcnn_benchmark/structures/bounding_box.py:9). A TPU
program needs static shapes, so here boxes are plain ``[..., N, 4]``
xyxy arrays paired with a boolean ``valid`` mask; all ops are pure
functions that broadcast/vmap cleanly.

Pixel conventions follow the reference's "+1" (TO_REMOVE) box algebra:
area = (x2-x1+1)(y2-y1+1) (bounding_box.py:240-244), IoU with +1 widths
(boxlist_ops.py:57-92), clip to [0, size-1] (bounding_box.py:228-233),
horizontal flip x' = W - x_opposite - 1 (bounding_box.py:149-151).
"""

from __future__ import annotations

import jax.numpy as jnp

TO_REMOVE = 1.0  # legacy +1 pixel convention used throughout the reference


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area with the +1 convention. boxes: [..., 4] xyxy."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return w * h


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix [N, M] with the +1 convention.

    Matches reference boxlist_ops.boxlist_iou (boxlist_ops.py:57-92).
    """
    area1 = box_area(boxes1)  # [N]
    area2 = box_area(boxes2)  # [M]
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])  # [N,M,2]
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])  # [N,M,2]
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-10)


def box_iou_int_uni(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """IoU plus raw intersection/union, the box analog of the reference's
    pycoco iouIntUni (pycoco/_mask.pyx:318-397). Returns (iou, inter, union)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-10), inter, union


def clip_to_image(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clamp coords into [0, size-1] (reference bounding_box.py:228-233)."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width - TO_REMOVE)
    y1 = jnp.clip(boxes[..., 1], 0.0, height - TO_REMOVE)
    x2 = jnp.clip(boxes[..., 2], 0.0, width - TO_REMOVE)
    y2 = jnp.clip(boxes[..., 3], 0.0, height - TO_REMOVE)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty_mask(boxes: jnp.ndarray, min_size: float = 0.0) -> jnp.ndarray:
    """True where the box has both sides >= min_size.

    Matches reference remove_small_boxes (boxlist_ops.py:38-54), which
    converts to xywh (w = x2-x1+1) and keeps w >= min_size & h >= min_size.
    """
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return (w >= min_size) & (h >= min_size)


def hflip_boxes(boxes: jnp.ndarray, width) -> jnp.ndarray:
    """Horizontal flip (reference bounding_box.py:149-151)."""
    x1 = width - boxes[..., 2] - TO_REMOVE
    x2 = width - boxes[..., 0] - TO_REMOVE
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def vflip_boxes(boxes: jnp.ndarray, height) -> jnp.ndarray:
    """Vertical flip (reference bounding_box.py:152-158)."""
    y1 = height - boxes[..., 3] - TO_REMOVE
    y2 = height - boxes[..., 1] - TO_REMOVE
    return jnp.stack([boxes[..., 0], y1, boxes[..., 2], y2], axis=-1)


def resize_boxes(boxes: jnp.ndarray, scale_x, scale_y) -> jnp.ndarray:
    """Scale box coords (reference bounding_box.py:95-131, ratio per axis)."""
    return boxes * jnp.asarray(
        [scale_x, scale_y, scale_x, scale_y], dtype=boxes.dtype
    )


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """xyxy -> xywh with the +1 convention (bounding_box.py:71-73)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1 + TO_REMOVE, y2 - y1 + TO_REMOVE], axis=-1)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """xywh -> xyxy with the +1 convention (bounding_box.py:84-90)."""
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [x, y, x + jnp.clip(w - TO_REMOVE, 0.0), y + jnp.clip(h - TO_REMOVE, 0.0)],
        axis=-1,
    )


def pad_boxes(boxes, scores, labels, size: int):
    """Host-side helper: pad (boxes[n,4], scores[n], labels[n]) to fixed
    ``size`` rows, returning arrays plus a valid mask."""
    import numpy as np

    n = min(len(boxes), size)
    out_b = np.zeros((size, 4), np.float32)
    out_s = np.zeros((size,), np.float32)
    out_l = np.zeros((size,), np.int32)
    out_v = np.zeros((size,), bool)
    out_b[:n] = np.asarray(boxes, np.float32)[:n]
    if scores is not None:
        out_s[:n] = np.asarray(scores, np.float32)[:n]
    if labels is not None:
        out_l[:n] = np.asarray(labels, np.int32)[:n]
    out_v[:n] = True
    return out_b, out_s, out_l, out_v
