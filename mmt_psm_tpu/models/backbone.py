"""Backbone builder (reference: modeling/backbone/backbone.py:12-44)."""

from __future__ import annotations

import flax.linen as nn

from .fpn import FPN
from .resnet import ResNet


class ResNetFPNBackbone(nn.Module):
    conv_body: str = "R-50-FPN"
    out_channels: int = 256
    freeze_at: int = 2
    stride_in_1x1: bool = True
    dtype: object = None
    remat: bool = False  # per-block gradient checkpointing (resnet.ResNet)

    @nn.compact
    def __call__(self, x):
        feats = ResNet(
            conv_body=self.conv_body,
            freeze_at=self.freeze_at,
            stride_in_1x1=self.stride_in_1x1,
            dtype=self.dtype,
            remat=self.remat,
            name="body",
        )(x)
        return FPN(out_channels=self.out_channels, use_p6=True, dtype=self.dtype, name="fpn")(feats)


class ResNetC4Backbone(nn.Module):
    conv_body: str = "R-50-C4"
    freeze_at: int = 2
    stride_in_1x1: bool = True
    dtype: object = None
    remat: bool = False  # per-block gradient checkpointing (resnet.ResNet)

    @nn.compact
    def __call__(self, x):
        feats = ResNet(
            conv_body=self.conv_body,
            freeze_at=self.freeze_at,
            stride_in_1x1=self.stride_in_1x1,
            dtype=self.dtype,
            remat=self.remat,
            name="body",
        )(x)
        return feats  # (C4,)


def build_backbone(cfg):
    body = cfg.MODEL.BACKBONE.CONV_BODY
    if body.endswith("-FPN"):
        return ResNetFPNBackbone(
            conv_body=body,
            out_channels=cfg.MODEL.BACKBONE.OUT_CHANNELS,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT,
            stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        )
    return ResNetC4Backbone(
        conv_body=body,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
    )
