"""Region Proposal Network: head, fixed-shape proposal selection, loss.

Parity targets in the reference:
* RPNHead — shared 3x3 conv + 1x1 cls / 1x1 bbox heads per FPN level
  (reference: maskrcnn_benchmark/modeling/rpn/rpn.py:14-46), init
  N(0, 0.01), bias 0.
* RPNPostProcessor — per-level top-k → decode → clip → remove-small →
  NMS → per-level cap (rpn/inference.py:78-137); across levels train
  selects a *global-over-batch* top FPN_POST_NMS_TOP_N, test per-image
  (rpn/inference.py:216-243); gt boxes appended in training
  (rpn/inference.py:55-76).
* RPNLossComputation — match (0.7/0.3, allow_low_quality), visibility
  and between-thresholds anchors ignored, 256@0.5 sampling, BCE
  objectness + smooth-L1(beta=1/9) normalized by total sampled
  (rpn/loss.py:138-196).

Shape notes: NHWC conv output [B, H, W, A(*4)] flattens to the same
(y, x, anchor) anchor order as the reference's NCHW permute(0,2,3,1)
(rpn/loss.py:112-123), so anchors/logits line up without re-indexing.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import box_coder as bc
from ..ops.matcher import BETWEEN_THRESHOLDS, match
from ..ops.nms import nms_topk
from ..ops.sampler import sample
from ..ops import losses as L
from ..structures.boxes import box_iou, clip_to_image, nonempty_mask
from ..structures.detections import GroundTruth, Proposals
from .anchors import visibility


class RPNHead(nn.Module):
    """Single-conv RPN head shared over levels (rpn.py:14-46)."""

    num_anchors: int = 3
    channels: int = 256
    dtype: object = None

    @nn.compact
    def __call__(self, features):
        init = nn.initializers.normal(0.01)
        conv = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=init, dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), kernel_init=init, dtype=self.dtype, name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), kernel_init=init, dtype=self.dtype, name="bbox_pred")
        logits, bbox_reg = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(cls(t))
            bbox_reg.append(reg(t))
        return logits, bbox_reg


def _flatten_level(logits_l, reg_l):
    """[B,H,W,A], [B,H,W,4A] -> [B,HWA], [B,HWA,4] in reference order."""
    b = logits_l.shape[0]
    obj = logits_l.reshape(b, -1)
    reg = reg_l.reshape(b, -1, 4)
    return obj, reg


def _select_single_level(
    logits, deltas, anchors, image_hw, *, pre_nms_top_n, post_nms_top_n, nms_thresh, min_size
):
    """Per-image, per-level proposal selection (rpn/inference.py:78-137).

    logits: [HWA] RAW objectness — sigmoid is strictly monotonic, so the
    top-k selection and NMS ordering are identical on logits and only
    the kept ``pre_nms_top_n`` scores pay the sigmoid (the reference
    sigmoids the full map first, rpn/inference.py:97; on TPU that is a
    [HWA] f32 map + materialization per (image, level) on the serving
    hot path for values that are thrown away). deltas: [HWA, 4];
    anchors: [HWA, 4]. Returns (boxes [post,4], scores [post], valid).
    """
    n = logits.shape[0]
    k = min(pre_nms_top_n, n)
    top_logits, top_idx = jax.lax.top_k(logits, k)
    top_scores = jax.nn.sigmoid(top_logits)
    # cast AFTER the gather: same values (elementwise), but the full
    # [HWA, 4] f32 regression map is never materialized
    top_deltas = deltas[top_idx].astype(jnp.float32)
    top_anchors = anchors[top_idx]
    boxes = bc.decode(top_deltas, top_anchors)
    boxes = clip_to_image(boxes, image_hw[0], image_hw[1])
    valid = nonempty_mask(boxes, min_size)
    keep_idx, keep_valid = nms_topk(boxes, top_scores, valid, nms_thresh, post_nms_top_n)
    return boxes[keep_idx], top_scores[keep_idx], keep_valid


def select_proposals(
    objectness: Sequence[jnp.ndarray],
    box_regression: Sequence[jnp.ndarray],
    anchors: Sequence[jnp.ndarray],
    image_sizes: jnp.ndarray,
    *,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    fpn_post_nms_top_n: int,
    nms_thresh: float,
    min_size: float,
    is_train: bool,
    gt: GroundTruth | None = None,
) -> Proposals:
    """Full RPN proposal selection over FPN levels, batched.

    objectness/box_regression: per level [B, H, W, A(*4)] raw conv
    outputs. anchors: per level [HWA, 4] (constant). image_sizes: [B, 2]
    (h, w) true sizes.
    """
    per_level = []
    for obj_l, reg_l, anc_l in zip(objectness, box_regression, anchors):
        obj, reg = _flatten_level(obj_l, reg_l)
        logits = obj.astype(jnp.float32)
        fn = partial(
            _select_single_level,
            pre_nms_top_n=pre_nms_top_n,
            post_nms_top_n=post_nms_top_n,
            nms_thresh=nms_thresh,
            min_size=min_size,
        )
        boxes_b, scores_b, valid_b = jax.vmap(fn, in_axes=(0, 0, None, 0))(
            logits, reg, anc_l, image_sizes
        )
        per_level.append((boxes_b, scores_b, valid_b))

    boxes = jnp.concatenate([p[0] for p in per_level], axis=1)  # [B, L*post, 4]
    scores = jnp.concatenate([p[1] for p in per_level], axis=1)
    valid = jnp.concatenate([p[2] for p in per_level], axis=1)
    b, total = scores.shape

    neg = -1e30
    masked = jnp.where(valid, scores, neg)
    k_out = min(fpn_post_nms_top_n, total)
    if is_train:
        # global top-k over the whole batch (rpn/inference.py:223-234)
        flat = masked.reshape(-1)
        kth = jax.lax.top_k(flat, min(k_out, flat.shape[0]))[0][-1]
        selected = valid & (masked >= kth)
        sel_scores = jnp.where(selected, scores, neg)
        # compact each image's selected rows into the first k_out slots
        top_scores, top_idx = jax.lax.top_k(sel_scores, k_out)
        out_valid = top_scores > neg / 2
    else:
        top_scores, top_idx = jax.lax.top_k(masked, k_out)
        out_valid = top_scores > neg / 2
    out_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    out_scores = jnp.where(out_valid, top_scores, 0.0)

    if is_train and gt is not None:
        # append gt boxes with objectness 1 (rpn/inference.py:55-76)
        out_boxes = jnp.concatenate([out_boxes, gt.boxes], axis=1)
        out_scores = jnp.concatenate([out_scores, jnp.where(gt.valid, 1.0, 0.0)], axis=1)
        out_valid = jnp.concatenate([out_valid, gt.valid], axis=1)
    return Proposals(boxes=out_boxes, scores=out_scores, valid=out_valid)


def _prepare_targets_single(anchors_all, vis_mask, gt_boxes, gt_valid, fg_thresh, bg_thresh):
    """Anchor labels/targets for one image (rpn/loss.py:56-83)."""
    quality = box_iou(gt_boxes, anchors_all)  # [M, A]
    matched = match(quality, gt_valid, fg_thresh, bg_thresh, allow_low_quality_matches=True)
    labels = (matched >= 0).astype(jnp.int32)
    labels = jnp.where(vis_mask, labels, -1)
    labels = jnp.where(matched == BETWEEN_THRESHOLDS, -1, labels)
    matched_gt = gt_boxes[jnp.maximum(matched, 0)]
    reg_targets = bc.encode(matched_gt, anchors_all)
    return labels, reg_targets


def rpn_loss(
    rng: jax.Array,
    objectness: Sequence[jnp.ndarray],
    box_regression: Sequence[jnp.ndarray],
    anchors: Sequence[jnp.ndarray],
    image_sizes: jnp.ndarray,
    gt: GroundTruth,
    *,
    fg_thresh: float = 0.7,
    bg_thresh: float = 0.3,
    batch_per_image: int = 256,
    positive_fraction: float = 0.5,
    straddle_thresh: float = 0.0,
):
    """RPN objectness + box losses (rpn/loss.py:138-196)."""
    anchors_all = jnp.concatenate(list(anchors), axis=0)  # [A_tot, 4]
    objs, regs = [], []
    for obj_l, reg_l in zip(objectness, box_regression):
        o, r = _flatten_level(obj_l, reg_l)
        objs.append(o)
        regs.append(r)
    obj_cat = jnp.concatenate(objs, axis=1).astype(jnp.float32)  # [B, A_tot]
    reg_cat = jnp.concatenate(regs, axis=1).astype(jnp.float32)  # [B, A_tot, 4]
    bsz = obj_cat.shape[0]

    def per_image(rng_i, gt_boxes, gt_valid, img_hw, obj_i, reg_i):
        vis = visibility(anchors_all, img_hw[0], img_hw[1], straddle_thresh)
        labels, reg_targets = _prepare_targets_single(
            anchors_all, vis, gt_boxes, gt_valid, fg_thresh, bg_thresh
        )
        idx, is_pos, valid = sample(rng_i, labels, batch_per_image, positive_fraction)
        s_obj = obj_i[idx]
        s_lab = labels[idx].astype(jnp.float32)
        pos_w = is_pos.astype(jnp.float32)
        val_w = valid.astype(jnp.float32)
        box_num = L.smooth_l1_sum(reg_i[idx], reg_targets[idx], beta=1.0 / 9, weight=pos_w[:, None])
        obj_num = jnp.sum(
            val_w
            * (jnp.maximum(s_obj, 0) - s_obj * s_lab + jnp.log1p(jnp.exp(-jnp.abs(s_obj))))
        )
        return box_num, obj_num, jnp.sum(val_w)

    rngs = jax.random.split(rng, bsz)
    box_nums, obj_nums, counts = jax.vmap(per_image)(
        rngs, gt.boxes, gt.valid, image_sizes, obj_cat, reg_cat
    )
    total = jnp.maximum(jnp.sum(counts), 1.0)
    # reference: box loss summed over positives / total sampled; objectness
    # BCE averaged over sampled (rpn/loss.py:186-194)
    return jnp.sum(obj_nums) / total, jnp.sum(box_nums) / total
