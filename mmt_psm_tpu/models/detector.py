"""GeneralizedRCNN: the full Mask R-CNN graph, fixed-shape.

Orchestration parity with the reference GeneralizedRCNN (reference:
maskrcnn_benchmark/modeling/detector/generalized_rcnn.py:17-115):
backbone -> RPN -> box head -> mask head, with training losses or padded
detections. The teacher/student mean-teacher paths (forward_teacher /
forward_student, generalized_rcnn.py:117-199) live in train/mt_step.py
as pure functions over this module's sub-forwards.

Static configuration is carried by ``ModelConfig`` (hashable dataclass)
so one jit trace serves every batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..structures.detections import Detections, GroundTruth, Proposals
from . import box_head as BH
from . import mask_head as MH
from . import rpn as RPN
from .anchors import fpn_anchors
from .backbone import ResNetFPNBackbone


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model hyperparameters (subset of the cfg tree that shapes
    the compiled program)."""

    image_size: int = 1024
    num_classes: int = 3
    # anchors / rpn
    anchor_sizes: tuple = (32, 64, 128, 256, 512)
    anchor_strides: tuple = (4, 8, 16, 32, 64)
    aspect_ratios: tuple = (0.5, 1.0, 2.0)
    straddle_thresh: float = 0.0
    rpn_fg_iou: float = 0.7
    rpn_bg_iou: float = 0.3
    rpn_batch_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    pre_nms_top_n_train: int = 2000
    pre_nms_top_n_test: int = 1000
    post_nms_top_n_train: int = 2000
    post_nms_top_n_test: int = 1000
    fpn_post_nms_top_n_train: int = 2000
    fpn_post_nms_top_n_test: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 0.0
    # roi heads
    box_fg_iou: float = 0.5
    box_bg_iou: float = 0.5
    box_batch_per_image: int = 512
    box_positive_fraction: float = 0.25
    reg_weights: tuple = (10.0, 10.0, 5.0, 5.0)
    pooler_scales: tuple = (0.25, 0.125, 0.0625, 0.03125)
    box_pooler_resolution: int = 7
    box_pooler_sampling: int = 2
    mlp_dim: int = 1024
    box_head_dropout: float = 0.0
    # test
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 200
    # "greedy" (boxlist_nms) or "set" (K_HEAD>1 set-NMS: device pass tags
    # head ids, host applies set_cpu_nms — box_head/inference.py:120-122)
    nms_type: str = "greedy"
    # mask
    mask_on: bool = True
    mask_pooler_resolution: int = 14
    mask_pooler_sampling: int = 2
    mask_resolution: int = 28
    mask_max_pos: int = 128
    # "MaskRCNNFPNFeatureExtractor" (FPN pooler + conv stack) or
    # "PRCNNFeatureExtractor" (CSPN baseline over the raw image,
    # roi_mask_feature_extractors.py:9-88)
    mask_extractor: str = "MaskRCNNFPNFeatureExtractor"
    # proposals-only model (MODEL.RPN_ONLY, reference rpn.py:178-213)
    rpn_only: bool = False
    # model family: "R-50-FPN" / "R-101-FPN" (pyramid) or "R-50-C4"
    # (single C4 level + stage-5 RoI head — backbone.py:12-44)
    conv_body: str = "R-50-FPN"
    # "FPN2MLPFeatureExtractor" (fc6/fc7) or
    # "ResNet50Conv5ROIFeatureExtractor" (C4 stage-5 head,
    # roi_box_feature_extractors.py:12-42)
    box_extractor: str = "FPN2MLPFeatureExtractor"
    # backbone
    backbone_out_channels: int = 256
    freeze_at: int = 2
    compute_dtype: str = "bfloat16"
    # gradient-checkpoint backbone bottleneck blocks (TPU.REMAT_BACKBONE):
    # the VJP recomputes block internals instead of saving them — a
    # bytes-for-FLOPs trade for the HBM-bound train step. Params are
    # unchanged; measured A/B in RESULTS.md before flipping the default.
    remat_backbone: bool = False
    # "gather" (exact full-map contraction, best measured on-TPU perf:
    # dense einsums ride the MXU) or "windowed" (crop+einsum; fewer FLOPs
    # but per-RoI gathers lower poorly on TPU — kept for future tuning)
    roi_align_impl: str = "pallas"
    # Pallas pooler window-start alignment (ops/roi_align_pallas.py):
    # coarser starts enlarge each DMA window by (align-8) rows/cols but
    # dedupe windows across nearby RoIs; pooled values are EXACT for any
    # align. Measured on captured flagship RoIs (scripts/window_stats.py):
    # align=32 cuts the box-head window traffic 375 -> 129 us/patch.
    pool_align: int = 8
    # mean-teacher hint adaptor (MGD): 1x1 conv per FPN level
    # (reference roi_box_feature_extractors.py:45-75, MT.T_ADAPT)
    with_hint_adaptor: bool = False
    hint_dim: int = 128
    # IR-Net relation-NMS head (generalized_rcnn.py:27-30, 63-95)
    with_relation_nms: bool = False
    relation: Any = None  # RelationNMSConfig
    # IR-Net mask relation refinement (mask_head.py:96-122)
    with_relation_mask: bool = False
    relation_mask: Any = None  # MaskRelationConfig

    @classmethod
    def from_cfg(cls, cfg, train: bool = True) -> "ModelConfig":
        """Single source of truth for cfg -> model graph.

        Reads the IR-Net head switches (MODEL.RELATION_NMS.USE_RELATION_NMS,
        MODEL.RELATION_MASK.USE_RELATION — reference
        generalized_rcnn.py:27-30,63,86-91) and the MGD hint adaptor switch
        (MT.FG_HINT — roi_box_feature_extractors.py:45-75), so train and
        eval CLIs build the same flagship graph the config asks for.
        """
        from .mask_relation import MaskRelationConfig
        from .relation import RelationNMSConfig

        use_rel_nms = bool(cfg.MODEL.RELATION_NMS.USE_RELATION_NMS)
        use_rel_mask = bool(cfg.MODEL.RELATION_MASK.USE_RELATION)
        return cls(
            with_hint_adaptor=bool(train and cfg.MT.FG_HINT > 0),
            with_relation_nms=use_rel_nms,
            relation=RelationNMSConfig.from_cfg(cfg) if use_rel_nms else None,
            with_relation_mask=use_rel_mask,
            relation_mask=MaskRelationConfig.from_cfg(cfg) if use_rel_mask else None,
            image_size=cfg.TPU.IMAGE_SIZE,
            num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            anchor_sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
            anchor_strides=tuple(cfg.MODEL.RPN.ANCHOR_STRIDE),
            aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
            straddle_thresh=float(cfg.MODEL.RPN.STRADDLE_THRESH),
            rpn_fg_iou=cfg.MODEL.RPN.FG_IOU_THRESHOLD,
            rpn_bg_iou=cfg.MODEL.RPN.BG_IOU_THRESHOLD,
            rpn_batch_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            rpn_positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
            pre_nms_top_n_train=cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN,
            pre_nms_top_n_test=cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST,
            post_nms_top_n_train=cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN,
            post_nms_top_n_test=cfg.MODEL.RPN.POST_NMS_TOP_N_TEST,
            fpn_post_nms_top_n_train=cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN,
            fpn_post_nms_top_n_test=cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST,
            rpn_nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
            rpn_min_size=float(cfg.MODEL.RPN.MIN_SIZE),
            box_fg_iou=cfg.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
            box_bg_iou=cfg.MODEL.ROI_HEADS.BG_IOU_THRESHOLD,
            box_batch_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            box_positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            reg_weights=tuple(cfg.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS),
            pooler_scales=tuple(cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES),
            box_pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            # the reference's sampling_ratio=0 means "adaptive per-roi grid"
            # (ROIAlign_cuda.cu:100-104) — data-dependent, so unsupported
            # under jit; fall back to the pap configs' static 2
            box_pooler_sampling=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO or 2,
            mlp_dim=cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM,
            box_head_dropout=cfg.MODEL.ROI_BOX_HEAD.DO,
            score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH,
            nms_thresh=cfg.MODEL.ROI_HEADS.NMS,
            detections_per_img=cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG,
            # set-NMS requires both switches, matching inference.py:120-122
            nms_type=(
                "set"
                if cfg.MODEL.ROI_HEADS.NMS_TYPE == "set" and cfg.MODEL.ROI_BOX_HEAD.K_HEAD > 1
                else "greedy"
            ),
            rpn_only=bool(cfg.MODEL.RPN_ONLY),
            mask_on=cfg.MODEL.MASK_ON and not cfg.MODEL.RPN_ONLY,
            mask_pooler_resolution=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
            mask_pooler_sampling=cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO or 2,
            mask_resolution=cfg.MODEL.ROI_MASK_HEAD.RESOLUTION,
            mask_extractor=cfg.MODEL.ROI_MASK_HEAD.FEATURE_EXTRACTOR,
            conv_body=cfg.MODEL.BACKBONE.CONV_BODY,
            box_extractor=cfg.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR,
            backbone_out_channels=cfg.MODEL.BACKBONE.OUT_CHANNELS,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT,
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
            roi_align_impl=cfg.TPU.ROI_ALIGN_IMPL,
            pool_align=int(cfg.TPU.POOL_ALIGN),
            remat_backbone=bool(cfg.TPU.REMAT_BACKBONE),
        )


class HintAdaptor(nn.Module):
    """Per-level 1x1 conv embedding for MGD feature distillation
    (reference MaskRCNNFPNAdaptor, roi_box_feature_extractors.py:45-75)."""

    out_dim: int = 128
    dtype: object = None

    @nn.compact
    def __call__(self, features):
        init = nn.initializers.variance_scaling(1.0 / 3, "fan_in", "uniform")
        return tuple(
            nn.Conv(self.out_dim, (1, 1), kernel_init=init, dtype=self.dtype, name=f"adapter_{i+1}")(f)
            for i, f in enumerate(features)
        )


class MaskRCNN(nn.Module):
    config: ModelConfig

    def setup(self):
        c = self.config
        # flax computation dtype: cast params to the compute dtype per call
        # so convs/matmuls run at bf16 MXU rate (dtype=None would promote
        # bf16 activations x f32 params back to f32 everywhere)
        dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        self.is_fpn = c.conv_body.endswith("-FPN")
        if self.is_fpn:
            self.backbone = ResNetFPNBackbone(
                conv_body=c.conv_body, out_channels=c.backbone_out_channels,
                freeze_at=c.freeze_at, dtype=dt, remat=c.remat_backbone,
                name="backbone",
            )
            rpn_channels = c.backbone_out_channels
            num_anchors = len(c.aspect_ratios)
        else:
            # C4 family: single stride-16 level, every anchor size on it
            from .backbone import ResNetC4Backbone

            self.backbone = ResNetC4Backbone(
                conv_body=c.conv_body, freeze_at=c.freeze_at, dtype=dt,
                remat=c.remat_backbone, name="backbone",
            )
            rpn_channels = 1024
            num_anchors = len(c.aspect_ratios) * len(c.anchor_sizes)
        self.rpn_head = RPN.RPNHead(num_anchors=num_anchors, channels=rpn_channels, dtype=dt, name="rpn")
        if c.rpn_only:
            return  # proposals-only model: no roi heads (rpn.py:178-213)
        if c.box_extractor == "ResNet50Conv5ROIFeatureExtractor":
            from .c4 import FastRCNNPredictor, ResNet50Conv5ROIExtractor

            self.box_extractor = ResNet50Conv5ROIExtractor(name="box_extractor")
            self.box_predictor = FastRCNNPredictor(num_classes=c.num_classes, name="box_predictor")
        else:
            self.box_extractor = BH.FPN2MLPExtractor(mlp_dim=c.mlp_dim, dropout=c.box_head_dropout, dtype=dt, name="box_extractor")
            self.box_predictor = BH.FPNPredictor(num_classes=c.num_classes, dtype=dt, name="box_predictor")
        if c.mask_on:
            if c.mask_extractor == "PRCNNFeatureExtractor":
                # CSPN baseline: conv tower over the raw image, batched by
                # nn.vmap with shared params (roi_mask_feature_extractors.py:9-88)
                self.mask_extractor = nn.vmap(
                    MH.PRCNNExtractor,
                    in_axes=0,
                    out_axes=0,
                    variable_axes={"params": None},
                    split_rngs={"params": False},
                )(dtype=dt, name="mask_extractor")
                self.mask_predictor = MH.PRCNNPredictor(num_classes=c.num_classes, dtype=dt, name="mask_predictor")
            elif c.mask_extractor == "ResNet50Conv5ROIFeatureExtractor":
                # C4: the mask head shares the box head's stage-5 extractor
                # (SHARE_BOX_FEATURE_EXTRACTOR) — only the predictor is its own
                self.mask_predictor = MH.MaskRCNNC4Predictor(num_classes=c.num_classes, dtype=dt, name="mask_predictor")
            else:
                self.mask_extractor = MH.MaskRCNNFPNExtractor(dtype=dt, name="mask_extractor")
                self.mask_predictor = MH.MaskRCNNC4Predictor(num_classes=c.num_classes, dtype=dt, name="mask_predictor")
        if c.with_hint_adaptor:
            self.hint_adaptor = HintAdaptor(out_dim=c.hint_dim, dtype=dt, name="hint_adaptor")
        if c.with_relation_nms:
            from .relation import RelationNMS

            # vmap over the batch axis with shared params: one trace for
            # the whole batch instead of a per-image Python loop
            self.relation_nms = nn.vmap(
                RelationNMS,
                in_axes=0,
                out_axes=0,
                variable_axes={"params": None},
                split_rngs={"params": False},
            )(config=c.relation, name="relation_nms")
        if c.with_relation_mask:
            from .mask_relation import MaskRelationRefineNet

            self.mask_relation = nn.vmap(
                MaskRelationRefineNet,
                in_axes=0,
                out_axes=0,
                variable_axes={"params": None},
                split_rngs={"params": False},
            )(config=c.relation_mask, name="mask_relation")

    # -- shared pieces ----------------------------------------------------
    def _anchors(self):
        c = self.config
        levels = fpn_anchors(c.image_size, c.anchor_strides, c.anchor_sizes, c.aspect_ratios)
        return [jnp.asarray(a) for a in levels]

    def extract_features(self, images):
        x = images.astype(self.config.compute_dtype)
        return self.backbone(x)

    def _box_forward(self, features, boxes, deterministic: bool, roi_chunk: int | None = None):
        c = self.config
        pooled = BH.pool_boxes_batched(
            features, boxes, c.pooler_scales, c.box_pooler_resolution, c.box_pooler_sampling,
            impl=c.roi_align_impl, roi_chunk=roi_chunk, align=c.pool_align,
        )
        b, s = pooled.shape[:2]
        flat = pooled.reshape(b * s, *pooled.shape[2:])
        if c.box_extractor == "ResNet50Conv5ROIFeatureExtractor":
            # C4: stage-5 head on pooled features; the relation heads'
            # appearance feature is its spatial mean (2048-d)
            feats = self.box_extractor(flat)
            logits, regs = self.box_predictor(feats)
            feats = jnp.mean(feats.astype(jnp.float32), axis=(1, 2))
        else:
            feats = self.box_extractor(flat, deterministic=deterministic)
            logits, regs = self.box_predictor(feats)
        return logits.reshape(b, s, -1), regs.reshape(b, s, -1), feats.reshape(b, s, -1)

    def _mask_forward(self, features, boxes, images=None):
        c = self.config
        if c.mask_extractor == "PRCNNFeatureExtractor":
            # CSPN baseline path: extractor runs on the raw image
            x = self.mask_extractor(images, boxes)  # [B, S, 25, 25, 32]
            logits = self.mask_predictor(x)
            return logits, x
        pooled = BH.pool_boxes_batched(
            features, boxes, c.pooler_scales, c.mask_pooler_resolution, c.mask_pooler_sampling,
            impl=c.roi_align_impl, align=c.pool_align,
        )
        b, s = pooled.shape[:2]
        flat = pooled.reshape(b * s, *pooled.shape[2:])
        if c.mask_extractor == "ResNet50Conv5ROIFeatureExtractor":
            # C4 mask head SHARES the box head's stage-5 extractor
            # (SHARE_BOX_FEATURE_EXTRACTOR, roi_heads.py:17-19,
            # mask_head/roi_mask_feature_extractors.py:15-42)
            x = self.box_extractor(flat)
        else:
            x = self.mask_extractor(flat)
        logits = self.mask_predictor(x)
        r = logits.shape[1]
        p = x.shape[1]
        return logits.reshape(b, s, r, r, -1), x.reshape(b, s, p, p, -1)

    def _refine_masks(self, mask_logits, mask_feats, labels, valid):
        """Batched mask relation refinement (mask_head.py:96-122),
        vmapped over images with shared params."""
        out = self.mask_relation(mask_feats, mask_logits, labels, valid)
        if self.config.relation_mask.same_predictor:
            # SAME_PREDICTOR: refined features go through the shared mask
            # predictor (mask_relation_module.py:97-101)
            feats, keep = out
            refined = self.mask_predictor(feats)
            return jnp.where(keep, refined, mask_logits)
        return out

    # -- sub-forwards for the mean-teacher loop ---------------------------
    def backbone_features(self, images):
        """Feature pyramid only (extract_aug_feat building block,
        generalized_rcnn.py:201-215)."""
        return self.extract_features(images)

    def hint_embeddings(self, features):
        """MGD embeddings (generalized_rcnn.py:218-222)."""
        return self.hint_adaptor(features)

    def rpn_raw(self, features):
        """Raw RPN conv outputs per level."""
        return self.rpn_head(features)

    def box_predictions(self, features, boxes, deterministic: bool = True, roi_chunk: int | None = None):
        """Pool + box MLP + predictor on given per-image box sets
        (ROIBoxHead._forward_single per-view body, box_head.py:77-100).
        Returns (class_logits, box_regression, fc7_features).

        roi_chunk bounds the pooling contraction's temp buffer — the MT
        step's stacked 2K-view batches pass a small chunk to stay inside
        HBM next to the training activations."""
        return self._box_forward(features, boxes, deterministic=deterministic, roi_chunk=roi_chunk)

    def teacher_proposals(self, features, image_sizes, pseudo_gt: GroundTruth):
        """Train-mode proposal selection against pseudo ground truth
        (rpn.forward_teacher -> box_selector_train, rpn.py:146-177)."""
        c = self.config
        objectness, box_reg = self.rpn_head(features)
        return RPN.select_proposals(
            objectness,
            box_reg,
            self._anchors(),
            image_sizes,
            pre_nms_top_n=c.pre_nms_top_n_train,
            post_nms_top_n=c.post_nms_top_n_train,
            fpn_post_nms_top_n=c.fpn_post_nms_top_n_train,
            nms_thresh=c.rpn_nms_thresh,
            min_size=c.rpn_min_size,
            is_train=True,
            gt=pseudo_gt,
        )

    def init_all(self, images, image_sizes, gt: GroundTruth):
        """Initialization-only forward touching every submodule (the
        training path plus the MGD hint adaptor)."""
        losses = self.forward_train(images, image_sizes, gt)
        if self.config.with_hint_adaptor:
            feats = self.extract_features(images)
            self.hint_adaptor(feats)
        return losses

    # -- training ---------------------------------------------------------
    def __call__(self, images, image_sizes, gt: GroundTruth | None = None, train: bool = False):
        if train:
            return self.forward_train(images, image_sizes, gt)
        return self.forward_test(images, image_sizes)

    def forward_train(self, images, image_sizes, gt: GroundTruth):
        c = self.config
        features = self.extract_features(images)
        objectness, box_reg = self.rpn_head(features)
        anchors = self._anchors()

        rng_rpn = self.make_rng("sample")
        loss_obj, loss_rpn_box = RPN.rpn_loss(
            rng_rpn,
            objectness,
            box_reg,
            anchors,
            image_sizes,
            gt,
            fg_thresh=c.rpn_fg_iou,
            bg_thresh=c.rpn_bg_iou,
            batch_per_image=c.rpn_batch_per_image,
            positive_fraction=c.rpn_positive_fraction,
            straddle_thresh=c.straddle_thresh,
        )
        if c.rpn_only:
            # RPN-only model: no roi heads, no proposal transformation
            # (reference rpn.py:178-199)
            return {"loss_objectness": loss_obj, "loss_rpn_box_reg": loss_rpn_box}

        proposals = RPN.select_proposals(
            [jax.lax.stop_gradient(o) for o in objectness],
            [jax.lax.stop_gradient(r) for r in box_reg],
            anchors,
            image_sizes,
            pre_nms_top_n=c.pre_nms_top_n_train,
            post_nms_top_n=c.post_nms_top_n_train,
            fpn_post_nms_top_n=c.fpn_post_nms_top_n_train,
            nms_thresh=c.rpn_nms_thresh,
            min_size=c.rpn_min_size,
            is_train=True,
            gt=gt,
        )

        rng_box = self.make_rng("sample")
        rois = BH.subsample_proposals(
            rng_box,
            proposals,
            gt,
            batch_size_per_image=c.box_batch_per_image,
            positive_fraction=c.box_positive_fraction,
            fg_thresh=c.box_fg_iou,
            bg_thresh=c.box_bg_iou,
            reg_weights=c.reg_weights,
        )
        class_logits, box_regression, box_feats = self._box_forward(features, rois.boxes, deterministic=False)
        loss_cls, loss_box = BH.box_head_loss(class_logits, box_regression, rois)

        losses = {
            "loss_objectness": loss_obj,
            "loss_rpn_box_reg": loss_rpn_box,
            "loss_classifier": loss_cls,
            "loss_box_reg": loss_box,
        }

        if c.with_relation_nms:
            # batched learned-NMS loss (generalized_rcnn.py:63-95)
            import functools

            from .relation import relation_nms_loss

            probs = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)
            out = self.relation_nms(
                box_feats, probs, box_regression, rois.boxes, rois.valid, image_sizes
            )
            per_image_loss = jax.vmap(
                functools.partial(relation_nms_loss, cfg=c.relation)
            )(out, gt.boxes, gt.labels, gt.valid)
            losses["nms_loss"] = jnp.mean(per_image_loss)

        if c.mask_on:
            m_boxes, m_labels, m_gt_idx, m_valid = MH.select_positive_rois(rois, c.mask_max_pos)
            mask_logits, mask_feats = self._mask_forward(features, m_boxes, images)

            # gather each RoI's matched gt mask and project into the box
            def per_image(masks_i, gt_idx_i, boxes_i):
                src = masks_i[gt_idx_i]  # [S, Hm, Wm]
                scale = gt.masks.shape[-1] / c.image_size
                # target resolution follows the predictor's output (25 for
                # the PRCNN baseline, RESOLUTION otherwise)
                return MH.crop_masks_to_boxes(src, boxes_i * scale, mask_logits.shape[2])

            mask_targets = jax.vmap(per_image)(gt.masks, m_gt_idx, m_boxes)
            loss_mask_1 = MH.mask_head_loss(mask_logits, mask_targets, m_labels, m_valid)
            if c.with_relation_mask:
                refined = self._refine_masks(mask_logits, mask_feats, m_labels, m_valid)
                loss_mask_2 = MH.mask_head_loss(refined, mask_targets, m_labels, m_valid)
                # deep supervision 0.5*(L1+L2) (mask_head.py:139-148)
                if c.relation_mask.deep_super:
                    losses["loss_mask"] = 0.5 * (loss_mask_1 + loss_mask_2)
                else:
                    losses["loss_mask"] = loss_mask_2
            else:
                losses["loss_mask"] = loss_mask_1
        return losses

    # -- inference --------------------------------------------------------
    def forward_test(self, images, image_sizes) -> Detections:
        features = self.extract_features(images)
        return self.detections_from_features(features, image_sizes, images)

    def detections_from_features(self, features, image_sizes, images=None) -> Detections:
        """Test-mode detection from an already-computed feature pyramid.

        Split out of forward_test so callers that already hold the
        features (the MT teacher's batched 2K-view backbone pass,
        generalized_rcnn.py:122-127 + :201-215) don't pay a second
        backbone pass over view 0. ``images`` is only needed by the
        PRCNN raw-image mask extractor.
        """
        c = self.config
        objectness, box_reg = self.rpn_head(features)
        anchors = self._anchors()
        proposals = RPN.select_proposals(
            objectness,
            box_reg,
            anchors,
            image_sizes,
            pre_nms_top_n=c.pre_nms_top_n_test,
            post_nms_top_n=c.post_nms_top_n_test,
            fpn_post_nms_top_n=c.fpn_post_nms_top_n_test,
            nms_thresh=c.rpn_nms_thresh,
            min_size=c.rpn_min_size,
            is_train=False,
        )
        if c.rpn_only:
            # proposals ARE the output, in decreasing objectness order
            # (reference rpn.py:201-213)
            order = jnp.argsort(-jnp.where(proposals.valid, proposals.scores, -jnp.inf), axis=1)
            boxes = jnp.take_along_axis(proposals.boxes, order[..., None], axis=1)
            scores = jnp.take_along_axis(proposals.scores, order, axis=1)
            valid = jnp.take_along_axis(proposals.valid, order, axis=1)
            return Detections(
                boxes=boxes,
                scores=jnp.where(valid, scores, 0.0),
                labels=jnp.where(valid, 1, 0),
                valid=valid,
            )
        class_logits, box_regression, box_feats = self._box_forward(features, proposals.boxes, deterministic=True)
        if c.with_relation_nms:
            # learned NMS replaces the classic post-processor at test time
            # (box_head.py:55-65, generalized_rcnn.py:86-91)
            import functools

            from .relation import relation_nms_inference

            probs = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)
            out = self.relation_nms(
                box_feats, probs, box_regression, proposals.boxes,
                proposals.valid, image_sizes,
            )
            boxes, scores, labels, valid = jax.vmap(
                functools.partial(relation_nms_inference, cfg=c.relation)
            )(out)
            dets = Detections(boxes=boxes, scores=scores, labels=labels, valid=valid)
        else:
            dets = BH.postprocess_boxes(
                class_logits,
                box_regression,
                proposals,
                image_sizes,
                num_classes=c.num_classes,
                score_thresh=c.score_thresh,
                nms_thresh=c.nms_thresh,
                detections_per_img=c.detections_per_img,
                reg_weights=c.reg_weights,
                nms_type=c.nms_type,
            )
        if c.mask_on:
            mask_logits, mask_feats = self._mask_forward(features, dets.boxes, images)
            if c.with_relation_mask:
                mask_logits = self._refine_masks(mask_logits, mask_feats, dets.labels, dets.valid)
            probs = MH.select_mask_probs(mask_logits, dets.labels)
            dets = dets.replace(masks=probs)
        return dets
