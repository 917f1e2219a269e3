"""Mask pasting (box-space 28x28 -> image-space canvas).

Device-side equivalent of the reference Masker paste
(reference: maskrcnn_benchmark/modeling/roi_heads/mask_head/
inference.py:169-246): each RoI's 28x28 probability map is bilinearly
resized to its box extent (w = x2-x1+1 pixel convention), thresholded
at 0.5, and written into a canvas. Instead of a dynamic per-box resize,
we evaluate the bilinear sample at every canvas pixel (fully
vectorized, fixed shapes).

``paste_integral`` directly produces the mean-teacher MGD "integral
foreground mask" — the per-pixel sum of pasted instance masks
(generalized_rcnn.py:129-131) — at a reduced canvas resolution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _sample_one(mask, box, ys, xs):
    """Bilinear-sample one RoI mask at canvas image coords.

    mask: [M, M] probs; box: [4]; ys/xs: [H]/[W] image-space coords.
    Returns [H, W] probabilities (0 outside the box).
    """
    m = mask.shape[0]
    w = box[2] - box[0] + 1.0
    h = box[3] - box[1] + 1.0
    # map image coord -> mask coord (align with torch interpolate resize)
    u = (xs - box[0] + 0.5) / w * m - 0.5  # [W]
    v = (ys - box[1] + 0.5) / h * m - 0.5  # [H]
    inside_x = (xs >= box[0] - 0.5) & (xs <= box[2] + 0.5)
    inside_y = (ys >= box[1] - 0.5) & (ys <= box[3] + 0.5)

    def interp_1d(c):
        c = jnp.clip(c, 0.0, m - 1.0)
        lo = jnp.floor(c)
        frac = c - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, m - 1)
        return lo, hi, frac

    vy_lo, vy_hi, fy = interp_1d(v)
    ux_lo, ux_hi, fx = interp_1d(u)
    top = mask[vy_lo][:, ux_lo] * (1 - fx)[None, :] + mask[vy_lo][:, ux_hi] * fx[None, :]
    bot = mask[vy_hi][:, ux_lo] * (1 - fx)[None, :] + mask[vy_hi][:, ux_hi] * fx[None, :]
    out = top * (1 - fy)[:, None] + bot * fy[:, None]
    return out * inside_y[:, None] * inside_x[None, :]


@partial(jax.jit, static_argnames=("out_size", "stride", "threshold", "chunk"))
def paste_integral(masks, boxes, valid, out_size: int, stride: float, threshold: float = 0.5, chunk: int = 32):
    """Sum of thresholded pasted instance masks on a [out, out] canvas.

    masks: [K, M, M] probs; boxes: [K, 4] image coords; valid: [K].
    Canvas pixel (i, j) sits at image coord ((i + 0.5) * stride - 0.5).
    """
    k = masks.shape[0]
    ys = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * stride - 0.5
    xs = ys

    def one(args):
        mask, box, v = args
        s = _sample_one(mask.astype(jnp.float32), box, ys, xs)
        return (s >= threshold).astype(jnp.float32) * v

    pad = (-k) % chunk
    masks_p = jnp.pad(masks, ((0, pad), (0, 0), (0, 0)))
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    valid_p = jnp.pad(valid.astype(jnp.float32), ((0, pad),))

    def chunk_fn(args):
        return jnp.sum(jax.vmap(lambda m, b, v: one((m, b, v)))(*args), axis=0)

    chunks = (
        masks_p.reshape(-1, chunk, *masks.shape[1:]),
        boxes_p.reshape(-1, chunk, 4),
        valid_p.reshape(-1, chunk),
    )
    partials = jax.lax.map(chunk_fn, chunks)
    return jnp.sum(partials, axis=0)  # [out, out]


def paste_masks(masks, boxes, valid, out_size: int, stride: float = 1.0):
    """Per-instance pasted probability maps [K, out, out] (no threshold,
    no sum) — the Masker output used by eval."""
    ys = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * stride - 0.5

    def one(mask, box, v):
        return _sample_one(mask.astype(jnp.float32), box, ys, ys) * v

    return jax.vmap(one)(masks, boxes, valid.astype(jnp.float32))
