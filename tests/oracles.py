"""Pure-numpy oracles transliterating the reference's CPU semantics.

These re-state the math of the reference kernels (csrc/cpu/nms_cpu.cpp,
csrc/cpu/ROIAlign_cpu.cpp, modeling/box_coder.py, modeling/matcher.py)
in independent numpy form so the JAX ops can be tested for exact parity
without torch or the CUDA extension.
"""

import numpy as np


def nms_oracle(boxes, scores, iou_threshold):
    """Greedy NMS, +1 area convention, suppress at IoU >= threshold.

    Returns the list of kept indices in descending score order
    (semantics of csrc/cpu/nms_cpu.cpp:37-63).
    """
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), dtype=bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas - inter)
        later = np.zeros(len(boxes), dtype=bool)
        later[order[np.where(order == i)[0][0] + 1:]] = True
        suppressed |= (iou >= iou_threshold) & later
    return np.array(keep, dtype=np.int64)


def iou_oracle(a, b):
    """Pairwise IoU with +1 convention (boxlist_ops.py:57-92)."""
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def roi_align_oracle(feat_hwc, rois, spatial_scale, pooled, sampling_ratio):
    """Scalar-loop ROIAlign matching ROIAlign_cpu.cpp:17-215 exactly.

    feat_hwc: [H, W, C]; rois: [N, 4] xyxy image coords. Returns [N, P, P, C].
    """
    H, W, C = feat_hwc.shape
    N = len(rois)
    out = np.zeros((N, pooled, pooled, C), dtype=np.float64)
    for n in range(N):
        sx = rois[n, 0] * spatial_scale
        sy = rois[n, 1] * spatial_scale
        ex = rois[n, 2] * spatial_scale
        ey = rois[n, 3] * spatial_scale
        rw = max(ex - sx, 1.0)
        rh = max(ey - sy, 1.0)
        bh = rh / pooled
        bw = rw / pooled
        g = sampling_ratio
        for ph in range(pooled):
            for pw in range(pooled):
                acc = np.zeros(C)
                for iy in range(g):
                    y = sy + ph * bh + (iy + 0.5) * bh / g
                    for ix in range(g):
                        x = sx + pw * bw + (ix + 0.5) * bw / g
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        yy = max(y, 0.0)
                        xx = max(x, 0.0)
                        y_lo = int(yy)
                        x_lo = int(xx)
                        if y_lo >= H - 1:
                            y_hi = y_lo = H - 1
                            yy = float(y_lo)
                        else:
                            y_hi = y_lo + 1
                        if x_lo >= W - 1:
                            x_hi = x_lo = W - 1
                            xx = float(x_lo)
                        else:
                            x_hi = x_lo + 1
                        ly, lx = yy - y_lo, xx - x_lo
                        hy, hx = 1 - ly, 1 - lx
                        acc += (
                            hy * hx * feat_hwc[y_lo, x_lo]
                            + hy * lx * feat_hwc[y_lo, x_hi]
                            + ly * hx * feat_hwc[y_hi, x_lo]
                            + ly * lx * feat_hwc[y_hi, x_hi]
                        )
                out[n, ph, pw] = acc / (g * g)
    return out


def box_encode_oracle(gt, prop, weights):
    ex_w = prop[:, 2] - prop[:, 0] + 1
    ex_h = prop[:, 3] - prop[:, 1] + 1
    ex_cx = prop[:, 0] + 0.5 * ex_w
    ex_cy = prop[:, 1] + 0.5 * ex_h
    gt_w = gt[:, 2] - gt[:, 0] + 1
    gt_h = gt[:, 3] - gt[:, 1] + 1
    gt_cx = gt[:, 0] + 0.5 * gt_w
    gt_cy = gt[:, 1] + 0.5 * gt_h
    wx, wy, ww, wh = weights
    return np.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * np.log(gt_w / ex_w),
            wh * np.log(gt_h / ex_h),
        ],
        axis=1,
    )


def box_decode_oracle(codes, boxes, weights, clip=np.log(1000.0 / 16)):
    widths = boxes[:, 2] - boxes[:, 0] + 1
    heights = boxes[:, 3] - boxes[:, 1] + 1
    cx = boxes[:, 0] + 0.5 * widths
    cy = boxes[:, 1] + 0.5 * heights
    wx, wy, ww, wh = weights
    dx = codes[:, 0::4] / wx
    dy = codes[:, 1::4] / wy
    dw = np.minimum(codes[:, 2::4] / ww, clip)
    dh = np.minimum(codes[:, 3::4] / wh, clip)
    pcx = dx * widths[:, None] + cx[:, None]
    pcy = dy * heights[:, None] + cy[:, None]
    pw = np.exp(dw) * widths[:, None]
    ph = np.exp(dh) * heights[:, None]
    out = np.zeros_like(codes)
    out[:, 0::4] = pcx - 0.5 * pw
    out[:, 1::4] = pcy - 0.5 * ph
    out[:, 2::4] = pcx + 0.5 * pw - 1
    out[:, 3::4] = pcy + 0.5 * ph - 1
    return out


def matcher_oracle(quality, high, low, allow_low_quality):
    """Reference Matcher semantics (modeling/matcher.py:44-139)."""
    matched_vals = quality.max(axis=0)
    matches = quality.argmax(axis=0).astype(np.int64)
    all_matches = matches.copy()
    below = matched_vals < low
    between = (matched_vals >= low) & (matched_vals < high)
    matches[below] = -1
    matches[between] = -2
    if allow_low_quality:
        highest_per_gt = quality.max(axis=1)
        gt_idx, pred_idx = np.nonzero(quality == highest_per_gt[:, None])
        matches[pred_idx] = all_matches[pred_idx]
    return matches


def random_boxes(rng, n, size=200, min_wh=4, max_wh=80):
    x1 = rng.uniform(0, size - max_wh, n)
    y1 = rng.uniform(0, size - max_wh, n)
    w = rng.uniform(min_wh, max_wh, n)
    h = rng.uniform(min_wh, max_wh, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)
