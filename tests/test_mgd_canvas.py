"""Quantify the MGD integral-canvas deviation (VERDICT r1 weak item 8).

The reference builds the MGD foreground hint by pasting teacher masks at
FULL image resolution, summing, and adaptive-avg-pooling to each FPN
level before binarizing at 0.5 (reference: generalized_rcnn.py:129-131,
259-264). The TPU design pastes thresholded masks directly at stride 4
(P2 resolution) and avg-pools down from there (train/mt_step.py
mgd_canvas_stride). This suite bounds the per-level disagreement of the
binarized foreground masks on realistic elliptical-cell cases.
"""

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

from mmt_psm_tpu.ops.paste import paste_integral, paste_masks


def _ellipse_prob(m=28):
    yy, xx = np.mgrid[0:m, 0:m]
    cy = cx = (m - 1) / 2
    r = ((yy - cy) / (m * 0.42)) ** 2 + ((xx - cx) / (m * 0.36)) ** 2
    return np.clip(1.2 - r, 0, 1).astype(np.float32)


def _case(seed, image_size=256, k=12):
    rng = np.random.default_rng(seed)
    boxes = []
    for _ in range(k):
        w = rng.uniform(24, 90)
        h = rng.uniform(24, 90)
        x1 = rng.uniform(0, image_size - w - 1)
        y1 = rng.uniform(0, image_size - h - 1)
        boxes.append([x1, y1, x1 + w, y1 + h])
    masks = np.stack([_ellipse_prob() for _ in range(k)])
    valid = np.ones(k, bool)
    return jnp.asarray(masks), jnp.asarray(np.asarray(boxes, np.float32)), jnp.asarray(valid)


def _reference_level_masks(masks, boxes, valid, image_size, level_sizes):
    """The reference pipeline: full-res paste -> threshold -> sum ->
    adaptive avg pool per level -> > 0.5."""
    probs = np.asarray(paste_masks(masks, boxes, valid, image_size, 1.0))
    integral = (probs >= 0.5).astype(np.float32).sum(0)  # [H, W]
    out = []
    for size in level_sizes:
        f = image_size // size
        pooled = integral.reshape(size, f, size, f).mean(axis=(1, 3))
        out.append(pooled > 0.5)
    return out


def _ours_level_masks(masks, boxes, valid, image_size, level_sizes, stride=4):
    canvas = paste_integral(masks, boxes, valid, image_size // stride, float(stride))
    canvas = jnp.asarray(canvas)[None, :, :, None]
    out = []
    for size in level_sizes:
        f = (image_size // stride) // size
        pooled = nn.avg_pool(canvas, (f, f), strides=(f, f)) if f > 1 else canvas
        out.append(np.asarray(pooled[0, :, :, 0]) > 0.5)
    return out


def test_mgd_canvas_deviation_bounded():
    image_size = 256
    level_sizes = [64, 32, 16, 8]  # P2..P5 at strides 4/8/16/32
    worst = 0.0
    for seed in range(5):
        masks, boxes, valid = _case(seed, image_size)
        ref = _reference_level_masks(masks, boxes, valid, image_size, level_sizes)
        ours = _ours_level_masks(masks, boxes, valid, image_size, level_sizes)
        for r, o in zip(ref, ours):
            disagree = np.mean(r != o)
            worst = max(worst, float(disagree))
            # the stride-4 shortcut may only blur instance boundaries:
            # <=3% of cells per level on realistic elliptical instances
            assert disagree <= 0.03, (seed, r.shape, disagree)
            # and it must never hallucinate large foreground regions
            # (measured worst case: 0.025 at the P3 level, seed 3)
            assert abs(r.mean() - o.mean()) <= 0.03
    # the bound is tight enough to be meaningful, not vacuous
    assert worst > 0.0


def test_mgd_canvas_exact_at_p2():
    """At the paste stride itself (P2), ours equals the reference's
    strided sampling of the full-res canvas for axis-aligned boxes."""
    image_size = 128
    masks, boxes, valid = _case(3, image_size, k=6)
    ours = np.asarray(paste_integral(masks, boxes, valid, image_size // 4, 4.0))
    probs = np.asarray(paste_masks(masks, boxes, valid, image_size, 1.0))
    full = (probs >= 0.5).astype(np.float32).sum(0)
    # canvas pixel (i,j) sits at image coord (i+0.5)*4-0.5 = 4i+1.5 —
    # between full-res pixels 4i+1 and 4i+2; sample both neighbors and
    # require ours to match one of them (sub-pixel phase)
    a = full[1::4, 1::4]
    b = full[2::4, 2::4]
    match = (ours == a) | (ours == b)
    assert match.mean() > 0.97
