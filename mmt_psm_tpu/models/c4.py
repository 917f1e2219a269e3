"""R-50-C4 model family components.

The reference retains the C4 (Detectron-style) alternative to FPN:
C4 backbone features -> single-scale 14x14 pooler -> ResNet stage-5 head
-> average pool -> linear predictors (reference:
modeling/backbone/resnet.py:127-171 ResNetHead,
modeling/roi_heads/box_head/roi_box_feature_extractors.py:12-42
ResNet50Conv5ROIFeatureExtractor, roi_box_predictors.py:5-29
FastRCNNPredictor; config configs/pap/e2e_mask_rcnn_R_50_C4_1x.yaml).

The pap flagship path is FPN; these modules complete the model-family
inventory and are individually tested.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .resnet import Bottleneck


class ResNetStage5Head(nn.Module):
    """Stage-5 (layer4) bottleneck stack applied to pooled RoI features
    (ResNetHead, resnet.py:127-171): 3 blocks, 1024 -> 2048, stride 2 on
    the first block (14x14 pooled -> 7x7)."""

    blocks: int = 3
    bottleneck_channels: int = 512
    out_channels: int = 2048
    first_stride: int = 2
    stride_in_1x1: bool = True

    @nn.compact
    def __call__(self, x):
        for b in range(self.blocks):
            x = Bottleneck(
                bottleneck_channels=self.bottleneck_channels,
                out_channels=self.out_channels,
                stride=self.first_stride if b == 0 else 1,
                stride_in_1x1=self.stride_in_1x1,
                name=f"layer4_{b}",
            )(x)
        return x


class ResNet50Conv5ROIExtractor(nn.Module):
    """Pooled C4 features -> stage-5 head (roi_box_feature_extractors.py:12-42).
    Pooling itself happens in the caller (single-scale ROIAlign)."""

    @nn.compact
    def __call__(self, pooled):
        return ResNetStage5Head(name="head")(pooled)  # [N, 7, 7, 2048]


class FastRCNNPredictor(nn.Module):
    """Global average pool -> cls/bbox linears (roi_box_predictors.py:5-29)."""

    num_classes: int = 3

    @nn.compact
    def __call__(self, x):
        # x: [N, H, W, C] stage-5 features
        pooled = jnp.mean(x, axis=(1, 2))
        cls = nn.Dense(self.num_classes, kernel_init=nn.initializers.normal(0.01), name="cls_score")(pooled)
        reg = nn.Dense(self.num_classes * 4, kernel_init=nn.initializers.normal(0.001), name="bbox_pred")(pooled)
        return cls, reg
