"""ResNet backbone (R-50 / R-101), frozen-BN variant.

Architecture parity with the reference cfg-driven ResNet (reference:
maskrcnn_benchmark/modeling/backbone/resnet.py:61-307): 7x7/2 stem with
FrozenBN + 3x3/2 maxpool (resnet.py:277-293), bottleneck blocks with the
stride on the first 1x1 conv when STRIDE_IN_1X1 (resnet.py:202-274),
stage channel doubling, and per-stage feature returns for FPN.

Module names mirror torchvision/maskrcnn-benchmark ("layer1.0.conv1")
so the torch-weight importer (utils/torch_import.py) is a pure rename.

Stage freezing (FREEZE_CONV_BODY_AT, resnet.py:108-115) is implemented
by (a) stop_gradient on frozen-stage outputs and (b) the optimizer's
trainability mask — the reference's requires_grad_(False).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FrozenBatchNorm, StemConv7S2D, conv, max_pool_3x3_s2

# (blocks per stage, return which stages) — resnet.py:40-58
STAGE_SPECS = {
    "R-50-C4": dict(blocks=(3, 4, 6), returns=(False, False, True)),
    "R-50-C5": dict(blocks=(3, 4, 6, 3), returns=(False, False, False, True)),
    "R-50-FPN": dict(blocks=(3, 4, 6, 3), returns=(True, True, True, True)),
    "R-101-FPN": dict(blocks=(3, 4, 23, 3), returns=(True, True, True, True)),
}


class Stem(nn.Module):
    out_channels: int = 64
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        # space-to-depth stem conv: identical math, ~7x faster than the
        # direct 3-channel conv on the MXU (see StemConv7S2D)
        x = StemConv7S2D(features=self.out_channels, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(self.out_channels, name="bn1")(x)
        x = nn.relu(x)
        return max_pool_3x3_s2(x)


class Bottleneck(nn.Module):
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    num_groups: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        residual = x
        if in_channels != self.out_channels:
            residual = conv(self.out_channels, 1, stride=self.stride, padding=0, name="downsample_conv", dtype=self.dtype)(x)
            residual = FrozenBatchNorm(self.out_channels, name="downsample_bn")(residual)

        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = conv(self.bottleneck_channels, 1, stride=s1, padding=0, name="conv1", dtype=self.dtype)(x)
        out = nn.relu(FrozenBatchNorm(self.bottleneck_channels, name="bn1")(out))
        out = conv(self.bottleneck_channels, 3, stride=s3, padding=1, name="conv2", groups=self.num_groups, dtype=self.dtype)(out)
        out = nn.relu(FrozenBatchNorm(self.bottleneck_channels, name="bn2")(out))
        out = conv(self.out_channels, 1, padding=0, name="conv3", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.out_channels, name="bn3")(out)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """Returns the tuple of per-stage features selected by the stage spec."""

    conv_body: str = "R-50-FPN"
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    freeze_at: int = 2  # freeze stem + stages < freeze_at (resnet.py:108-115)
    dtype: object = None
    # gradient-checkpoint each bottleneck block: the VJP recomputes the
    # block's internals instead of saving them, trading FLOPs (cheap at
    # the measured 22% MFU) for the HBM bytes that bound the train step
    # (RESULTS.md "MT-step stage decomposition"). Params/name structure
    # are unchanged, so checkpoints stay interchangeable.
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        spec = STAGE_SPECS[self.conv_body]
        x = Stem(self.stem_out_channels, name="stem", dtype=self.dtype)(x)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        outputs = []
        stage2_bottleneck = self.num_groups * self.width_per_group
        for i, (n_blocks, ret) in enumerate(zip(spec["blocks"], spec["returns"])):
            stage_idx = i + 1  # layer1..layer4
            bottleneck_ch = stage2_bottleneck * 2**i
            out_ch = self.res2_out_channels * 2**i
            first_stride = 1 if i == 0 else 2
            for b in range(n_blocks):
                x = block_cls(
                    bottleneck_channels=bottleneck_ch,
                    out_channels=out_ch,
                    stride=first_stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    num_groups=self.num_groups,
                    name=f"layer{stage_idx}_{b}",
                    dtype=self.dtype,
                )(x)
            if self.freeze_at >= stage_idx + 1:
                x = jax.lax.stop_gradient(x)
            if ret:
                outputs.append(x)
        return tuple(outputs)


def resnet_out_channels(cfg) -> Sequence[int]:
    base = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS
    spec = STAGE_SPECS[cfg.MODEL.BACKBONE.CONV_BODY]
    return tuple(base * 2**i for i in range(len(spec["blocks"])))
