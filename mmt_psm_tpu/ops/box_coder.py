"""Faster R-CNN box encoding/decoding.

Same math as the reference BoxCoder (reference:
maskrcnn_benchmark/modeling/box_coder.py:7-95): +1 width convention,
per-coordinate weights, exp clipping at log(1000/16), and the decode
"-1" on x2/y2.
"""

from __future__ import annotations

import math
from functools import partial

import jax.numpy as jnp

BBOX_XFORM_CLIP = math.log(1000.0 / 16)
TO_REMOVE = 1.0


def encode(reference_boxes: jnp.ndarray, proposals: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Encode ``reference_boxes`` (targets) relative to ``proposals``.

    Both [..., N, 4] xyxy. Returns [..., N, 4] (dx, dy, dw, dh).
    """
    ex_w = proposals[..., 2] - proposals[..., 0] + TO_REMOVE
    ex_h = proposals[..., 3] - proposals[..., 1] + TO_REMOVE
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0] + TO_REMOVE
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1] + TO_REMOVE
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    wx, wy, ww, wh = weights
    # Guard against padded zero-size proposals producing nan/inf under jit.
    ex_w = jnp.maximum(ex_w, 1e-6)
    ex_h = jnp.maximum(ex_h, 1e-6)
    gt_w = jnp.maximum(gt_w, 1e-6)
    gt_h = jnp.maximum(gt_h, 1e-6)
    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode(rel_codes: jnp.ndarray, boxes: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Decode deltas against anchor/proposal ``boxes``.

    rel_codes: [..., N, 4*K] (K classes interleaved as in the reference) or
    [..., N, 4]. boxes: [..., N, 4]. Returns same shape as rel_codes.
    """
    boxes = boxes.astype(rel_codes.dtype)
    widths = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    heights = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    dx = rel_codes[..., 0::4] / wx
    dy = rel_codes[..., 1::4] / wy
    dw = jnp.minimum(rel_codes[..., 2::4] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(rel_codes[..., 3::4] / wh, BBOX_XFORM_CLIP)

    pred_cx = dx * widths[..., None] + ctr_x[..., None]
    pred_cy = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    x1 = pred_cx - 0.5 * pred_w
    y1 = pred_cy - 0.5 * pred_h
    x2 = pred_cx + 0.5 * pred_w - 1.0  # the asymmetric -1 is intentional
    y2 = pred_cy + 0.5 * pred_h - 1.0
    # Re-interleave to [..., N, 4K] matching input layout.
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # [..., N, K, 4]
    return out.reshape(rel_codes.shape)


class BoxCoder:
    """Thin stateful wrapper mirroring the reference API."""

    def __init__(self, weights=(1.0, 1.0, 1.0, 1.0), bbox_xform_clip=BBOX_XFORM_CLIP):
        self.weights = tuple(float(w) for w in weights)
        self.bbox_xform_clip = bbox_xform_clip

    def encode(self, reference_boxes, proposals):
        return encode(reference_boxes, proposals, self.weights)

    def decode(self, rel_codes, boxes):
        return decode(rel_codes, boxes, self.weights)


rpn_box_coder = partial(BoxCoder, weights=(1.0, 1.0, 1.0, 1.0))
