"""RoI box head: feature extractor, predictor, target prep, loss, inference.

Parity targets in the reference:
* FPN2MLPFeatureExtractor — 7x7 pooler + fc6/fc7(1024) with dropout
  (reference: maskrcnn_benchmark/modeling/roi_heads/box_head/
  roi_box_feature_extractors.py:78-125).
* FPNPredictor — linear cls(C) + reg(4C), init N(0,0.01)/N(0,0.001)
  (roi_box_predictors.py:31-53).
* FastRCNNLossComputation — match 0.5/0.5 (no low-quality), sample
  512@0.25, CE + class-sliced smooth-L1(beta=1)/num_sampled
  (box_head/loss.py:40-162).
* PostProcessor — softmax, per-class decode+clip, score>0.05, per-class
  NMS 0.5, cap DETECTIONS_PER_IMG over classes
  (box_head/inference.py:36-145).

Fixed-shape reformulation: subsampling returns exactly
``batch_size_per_image`` slots with masks; inference keeps a padded
per-class buffer then a global top-K.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import box_coder as bc
from ..ops import losses as L
from ..ops.matcher import BETWEEN_THRESHOLDS, match
from ..ops.nms import nms_topk
from ..ops.pooler import multilevel_roi_align
from ..ops.sampler import sample
from ..structures.boxes import box_iou, clip_to_image
from ..structures.detections import Detections, GroundTruth, Proposals


class FPN2MLPExtractor(nn.Module):
    """Pooled features -> fc6 -> fc7 (roi_box_feature_extractors.py:78-125)."""

    mlp_dim: int = 1024
    dropout: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, pooled, deterministic: bool = True):
        # pooled: [N, P, P, C] -> flatten (HWC order; the torch importer
        # permutes fc6 weights to match)
        x = pooled.reshape(pooled.shape[0], -1)
        init = nn.initializers.variance_scaling(1.0 / 3, "fan_in", "uniform")
        x = nn.relu(nn.Dense(self.mlp_dim, kernel_init=init, dtype=self.dtype, name="fc6")(x))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(self.mlp_dim, kernel_init=init, dtype=self.dtype, name="fc7")(x))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class FPNPredictor(nn.Module):
    """Class logits + per-class box deltas (roi_box_predictors.py:31-53)."""

    num_classes: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        cls = nn.Dense(self.num_classes, kernel_init=nn.initializers.normal(0.01), dtype=self.dtype, name="cls_score")(x)
        reg = nn.Dense(self.num_classes * 4, kernel_init=nn.initializers.normal(0.001), dtype=self.dtype, name="bbox_pred")(x)
        return cls, reg


class SampledRoIs(NamedTuple):
    boxes: jnp.ndarray  # [B, S, 4]
    labels: jnp.ndarray  # i32 [B, S] (0 bg, >0 fg)
    reg_targets: jnp.ndarray  # [B, S, 4]
    is_pos: jnp.ndarray  # bool [B, S]
    valid: jnp.ndarray  # bool [B, S]
    matched_gt: jnp.ndarray  # i32 [B, S] index into gt rows (clamped)


def subsample_proposals(
    rng: jax.Array,
    proposals: Proposals,
    gt: GroundTruth,
    *,
    batch_size_per_image: int = 512,
    positive_fraction: float = 0.25,
    fg_thresh: float = 0.5,
    bg_thresh: float = 0.5,
    reg_weights=(10.0, 10.0, 5.0, 5.0),
) -> SampledRoIs:
    """Match + balanced-sample proposals (box_head/loss.py:40-116)."""

    def per_image(rng_i, p_boxes, p_valid, g_boxes, g_labels, g_valid):
        quality = box_iou(g_boxes, p_boxes)
        # invalid proposals can never match; make them ignore(-1) below
        matched = match(quality, g_valid, fg_thresh, bg_thresh)
        labels = g_labels[jnp.maximum(matched, 0)]
        labels = jnp.where(matched == -1, 0, labels)
        labels = jnp.where(matched == BETWEEN_THRESHOLDS, -1, labels)
        labels = jnp.where(p_valid, labels, -1)  # padding: never sampled
        matched_gt = g_boxes[jnp.maximum(matched, 0)]
        reg_targets = bc.encode(matched_gt, p_boxes, reg_weights)

        idx, is_pos, valid = sample(rng_i, labels, batch_size_per_image, positive_fraction)
        return (
            p_boxes[idx],
            jnp.where(is_pos, labels[idx], 0).astype(jnp.int32),
            reg_targets[idx],
            is_pos,
            valid,
            jnp.maximum(matched, 0)[idx].astype(jnp.int32),
        )

    b = proposals.boxes.shape[0]
    rngs = jax.random.split(rng, b)
    out = jax.vmap(per_image)(rngs, proposals.boxes, proposals.valid, gt.boxes, gt.labels, gt.valid)
    return SampledRoIs(*out)


def pool_boxes_batched(features, boxes, scales, resolution, sampling_ratio, impl: str = "windowed", roi_chunk: int | None = None, align: int = 8):
    """Multi-level pooling for batched per-image box sets.

    features: per-level [B, H, W, C]; boxes: [B, S, 4]. Returns
    [B, S, P, P, C]. impl: "pallas" (TPU windowed-DMA kernel, ops/
    roi_align_pallas.py; falls back to "windowed" off-TPU), "windowed"
    (XLA gather fast path) or "gather" (exact full-map contraction).
    """
    if impl == "pallas" and (len(scales) == 1 or features[0].shape[-1] > 512):
        # C4-family: no level mapper bounds the RoI span (stride-16
        # spans reach the whole map) and C=1024 windows blow the VMEM
        # budget — stay on the exact XLA path there
        impl = "gather"
    if impl == "pallas":
        import jax as _jax

        if _jax.default_backend() == "tpu":
            from ..ops.roi_align_pallas import multilevel_roi_align_pallas

            return multilevel_roi_align_pallas(
                tuple(features), boxes, tuple(scales), resolution, sampling_ratio,
                48, align,
            )
        impl = "gather"  # off-TPU (CPU parity tests): the exact path

    if impl == "windowed":
        from ..ops.roi_align_windowed import multilevel_roi_align_windowed

        def pool_one(img_feats, img_boxes):
            return multilevel_roi_align_windowed(
                tuple(img_feats), img_boxes, tuple(scales), resolution, sampling_ratio
            )

    elif impl == "banded" and boxes.shape[1] >= 512:
        # banded pays off when many RoIs share a sorted row band (the
        # 1000-proposal box head); small sets (the 200-detection mask
        # head) are faster on the exact kernel (measured 48 vs 40 ms)
        from ..ops.roi_align_banded import multilevel_roi_align_banded

        def pool_one(img_feats, img_boxes):
            return multilevel_roi_align_banded(
                list(img_feats), img_boxes, scales, resolution, sampling_ratio
            )

    else:

        def pool_one(img_feats, img_boxes):
            kw = {"roi_chunk": roi_chunk} if roi_chunk else {}
            return multilevel_roi_align(list(img_feats), img_boxes, scales, resolution, sampling_ratio, **kw)

    return jax.vmap(pool_one, in_axes=(0, 0))(tuple(features), boxes)


def box_head_loss(class_logits, box_regression, rois: SampledRoIs):
    """CE + smooth-L1 (box_head/loss.py:118-162).

    class_logits: [B, S, C]; box_regression: [B, S, 4C].
    """
    c = class_logits.shape[-1]
    logits = class_logits.reshape(-1, c).astype(jnp.float32)
    regs = box_regression.reshape(-1, 4 * c).astype(jnp.float32)
    labels = rois.labels.reshape(-1)
    valid = rois.valid.reshape(-1).astype(jnp.float32)
    is_pos = rois.is_pos.reshape(-1).astype(jnp.float32)
    targets = rois.reg_targets.reshape(-1, 4)

    cls_loss = L.softmax_ce(logits, labels, weight=valid)

    # gather the 4 regression channels of the target class
    lab = jnp.maximum(labels, 0)
    offs = 4 * lab[:, None] + jnp.arange(4)[None, :]
    reg_pred = jnp.take_along_axis(regs, offs, axis=1)
    box_loss = L.smooth_l1_sum(reg_pred, targets, beta=1.0, weight=is_pos[:, None])
    box_loss = box_loss / jnp.maximum(jnp.sum(valid), 1.0)
    return cls_loss, box_loss


def postprocess_boxes(
    class_logits,
    box_regression,
    proposals: Proposals,
    image_sizes,
    *,
    num_classes: int,
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    detections_per_img: int = 200,
    reg_weights=(10.0, 10.0, 5.0, 5.0),
    nms_type: str = "greedy",
) -> Detections:
    """Per-class thresh + NMS + global cap (box_head/inference.py:92-145).

    nms_type="set" (K_HEAD>1 + MODEL.ROI_HEADS.NMS_TYPE='set',
    inference.py:120-122): the device pass only thresholds + caps and
    tags each detection with its source-proposal index; the data-
    dependent set-NMS itself runs on host (``set_nms_filter``) — its
    keep set depends on mutable claim bookkeeping that has no fixed-
    shape formulation worth compiling.
    """

    def per_image(logits, regs, p_boxes, p_valid, img_hw):
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # [N, C]
        decoded = bc.decode(regs.astype(jnp.float32), p_boxes, reg_weights)  # [N, 4C]
        decoded = decoded.reshape(-1, num_classes, 4)
        decoded = clip_to_image(decoded, img_hw[0], img_hw[1])
        prop_idx = jnp.arange(p_boxes.shape[0], dtype=jnp.int32)

        all_boxes, all_scores, all_labels, all_valid, all_heads = [], [], [], [], []
        for j in range(1, num_classes):
            boxes_j = decoded[:, j, :]
            scores_j = probs[:, j]
            valid_j = p_valid & (scores_j > score_thresh)
            if nms_type == "set":
                masked_j = jnp.where(valid_j, scores_j, -1e30)
                _, idx = jax.lax.top_k(masked_j, min(detections_per_img, boxes_j.shape[0]))
                v = masked_j[idx] > -1e29
            else:
                idx, v = nms_topk(boxes_j, scores_j, valid_j, nms_thresh, detections_per_img)
            all_boxes.append(boxes_j[idx])
            all_scores.append(jnp.where(v, scores_j[idx], 0.0))
            all_labels.append(jnp.full(idx.shape, j, jnp.int32))
            all_valid.append(v)
            all_heads.append(prop_idx[idx])
        boxes = jnp.concatenate(all_boxes, axis=0)
        scores = jnp.concatenate(all_scores, axis=0)
        labels = jnp.concatenate(all_labels, axis=0)
        valid = jnp.concatenate(all_valid, axis=0)
        heads = jnp.concatenate(all_heads, axis=0)

        masked = jnp.where(valid, scores, -1e30)
        top_scores, top_idx = jax.lax.top_k(masked, detections_per_img)
        keep_valid = top_scores > -1e29
        return (
            boxes[top_idx],
            jnp.where(keep_valid, top_scores, 0.0),
            labels[top_idx],
            keep_valid,
            heads[top_idx],
        )

    b_boxes, b_scores, b_labels, b_valid, b_heads = jax.vmap(per_image)(
        class_logits, box_regression, proposals.boxes, proposals.valid, image_sizes
    )
    return Detections(
        boxes=b_boxes,
        scores=b_scores,
        labels=jnp.where(b_valid, b_labels, 0),
        valid=b_valid,
        head_ids=b_heads if nms_type == "set" else None,
    )


def set_nms_filter(boxes, scores, labels, valid, head_ids, nms_thresh=0.5, num_classes=3):
    """Host post-step for nms_type="set": per class, run set-NMS over the
    thresholded detections and clear ``valid`` on suppressed ones
    (reference set_cpu_nms call, box_head/inference.py:120-122). Inputs
    are one image's numpy arrays; returns the updated valid mask."""
    import numpy as np

    from ..ops.python_nms import set_cpu_nms

    valid = np.asarray(valid).copy()
    for j in range(1, num_classes):
        sel = np.flatnonzero(valid & (np.asarray(labels) == j))
        if len(sel) < 2:
            continue
        keep = set_cpu_nms(
            np.asarray(boxes)[sel], np.asarray(scores)[sel], np.asarray(head_ids)[sel], nms_thresh
        )
        valid[sel[~keep]] = False
    return valid
