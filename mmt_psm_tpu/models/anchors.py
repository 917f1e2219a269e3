"""Anchor generation.

Bit-exact port of the classic Faster R-CNN anchor enumeration used by
the reference (reference:
maskrcnn_benchmark/modeling/rpn/anchor_generator.py:196-265): cell
anchors are enumerated around a (0,0,stride-1,stride-1) window with
rounded widths/heights, then shifted over the feature grid
(anchor_generator.py:68-93). Visibility flags anchors that straddle the
image border beyond ``straddle_thresh`` (anchor_generator.py:95-108).

Because images are padded to a fixed canvas, anchors are a *compile-time
constant* per (image_size, config) — computed once in numpy on the host
and closed over by the jitted step. Per-image visibility w.r.t. the
un-padded image size is computed on device (it depends on each image's
true size).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    return w, h, anchor[0] + 0.5 * (w - 1), anchor[1] + 0.5 * (h - 1)


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack(
        [
            x_ctr - 0.5 * (ws - 1),
            y_ctr - 0.5 * (hs - 1),
            x_ctr + 0.5 * (ws - 1),
            y_ctr + 0.5 * (hs - 1),
        ]
    )


def generate_cell_anchors(stride=16, sizes=(32, 64, 128, 256, 512), aspect_ratios=(0.5, 1, 2)) -> np.ndarray:
    """Cell anchors for one stride: [len(sizes)*len(ratios), 4] float32."""
    scales = np.array(sizes, dtype=np.float64) / stride
    ratios = np.array(aspect_ratios, dtype=np.float64)
    base = np.array([1, 1, stride, stride], dtype=np.float64) - 1

    w, h, x_ctr, y_ctr = _whctrs(base)
    size = w * h
    ws = np.round(np.sqrt(size / ratios))
    hs = np.round(ws * ratios)
    ratio_anchors = _mkanchors(ws, hs, x_ctr, y_ctr)

    out = []
    for i in range(ratio_anchors.shape[0]):
        w, h, x_ctr, y_ctr = _whctrs(ratio_anchors[i])
        out.append(_mkanchors(w * scales, h * scales, x_ctr, y_ctr))
    return np.vstack(out).astype(np.float32)


def grid_anchors(cell: np.ndarray, grid_h: int, grid_w: int, stride: int) -> np.ndarray:
    """Shifted anchors [grid_h*grid_w*A, 4], row-major over (y, x, anchor)."""
    shifts_x = np.arange(0, grid_w * stride, stride, dtype=np.float32)
    shifts_y = np.arange(0, grid_h * stride, stride, dtype=np.float32)
    sx, sy = np.meshgrid(shifts_x, shifts_y)  # [H, W]
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    return (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)


@lru_cache(maxsize=16)
def fpn_anchors(
    image_size: int,
    strides: tuple = (4, 8, 16, 32, 64),
    sizes: tuple = (32, 64, 128, 256, 512),
    aspect_ratios: tuple = (0.5, 1.0, 2.0),
):
    """Per-level anchors for a square padded canvas.

    Returns a list of float32 [H_l*W_l*A, 4] arrays (one per level).
    FPN pairs one size with each stride; a single stride (the C4 family)
    gets every size at that level (anchor_generator.py:54-66).
    """
    out = []
    if len(strides) == 1:
        grid = image_size // strides[0]
        cell = generate_cell_anchors(strides[0], sizes, aspect_ratios)
        return [grid_anchors(cell, grid, grid, strides[0])]
    for stride, size in zip(strides, sizes):
        grid = image_size // stride
        cell = generate_cell_anchors(stride, (size,), aspect_ratios)
        out.append(grid_anchors(cell, grid, grid, stride))
    return out


def visibility(anchors, image_h, image_w, straddle_thresh: float = 0):
    """Per-anchor visibility mask (jax or numpy arrays).

    anchors: [..., 4]; image_h/w may be traced scalars (per-image true size).
    """
    if straddle_thresh < 0:
        import numpy as _np

        return _np.ones(anchors.shape[:-1], dtype=bool) if isinstance(anchors, _np.ndarray) else anchors[..., 0] == anchors[..., 0]
    return (
        (anchors[..., 0] >= -straddle_thresh)
        & (anchors[..., 1] >= -straddle_thresh)
        & (anchors[..., 2] < image_w + straddle_thresh)
        & (anchors[..., 3] < image_h + straddle_thresh)
    )
