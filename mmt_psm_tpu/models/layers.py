"""Shared NN layers.

TPU notes: everything is NHWC (XLA's native conv layout); params are
kept float32 with activations computed in a configurable dtype
(bfloat16 on TPU so convs hit the MXU at full rate).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine params.

    Matches reference FrozenBatchNorm2d (reference:
    maskrcnn_benchmark/layers/batch_norm.py:6-24): ``scale = weight *
    rsqrt(running_var)`` with NO eps, ``bias = bias - mean * scale``.
    The four buffers live in ``params`` but are excluded from
    optimization by the solver's trainability mask (see
    train/optim.py) — mirroring torch buffers.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight * jnp.reciprocal(jnp.sqrt(var))
        shift = bias - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def conv(features, kernel, stride=1, padding="SAME", use_bias=False, name=None, groups=1, dtype=None):
    """Conv2D with torch-style explicit padding semantics.

    ``dtype`` is the flax computation dtype: when set (bfloat16 on TPU)
    params are cast to it per call so the conv actually runs on the MXU
    at bf16 rate — with dtype=None flax promotes bf16 activations x f32
    params back to f32 (silently 2x+ slower).
    """
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        use_bias=use_bias,
        feature_group_count=groups,
        name=name,
        dtype=dtype,  # param_dtype stays f32
    )


def max_pool_3x3_s2(x):
    """torch max_pool2d(kernel=3, stride=2, padding=1)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
