"""Shared NN layers.

TPU notes: everything is NHWC (XLA's native conv layout); params are
kept float32 with activations computed in a configurable dtype
(bfloat16 on TPU so convs hit the MXU at full rate).
"""

from __future__ import annotations

import flax.linen as nn
import jax
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


class StemConv7S2D(nn.Module):
    """The R-50 stem conv (7x7/2, pad 3, no bias) computed via a 2x2
    space-to-depth rewrite.

    A 3-channel input uses 3/128 of the MXU's contraction lanes; the
    direct conv measured 80 ms for the production batch-8 x 1024^2 stem
    vs 11 ms for the algebraically identical conv4x4/1 over the 2x2
    block-to-depth input (12 lanes). Kernel slot (d, p) maps to the
    original tap a = 2d + p - 1 (the a = -1 slot stays zero), so the
    parameter keeps the reference's [7, 7, 3, C] layout and name
    ("conv1/kernel") and torch-weight import is unchanged.
    """

    features: int = 64
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (7, 7, x.shape[-1], self.features),
        )
        dt = self.dtype or x.dtype
        b, h, ww, c = x.shape
        if h % 2 or ww % 2:
            return jax.lax.conv_general_dilated(
                x.astype(dt), w.astype(dt), (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt,
            )
        xs = (
            x.reshape(b, h // 2, 2, ww // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, ww // 2, 4 * c)
        )
        # scatter taps into [d, p, e, q, c, F]: tap a sits at
        # (d, p) = ((a+1)//2, (a+1)%2); the (0, 0) slot (a = -1) stays 0
        rows = jnp.arange(7)
        d_idx, p_idx = (rows + 1) // 2, (rows + 1) % 2
        k = jnp.zeros((4, 2, 4, 2, c, self.features), w.dtype)
        k = k.at[d_idx[:, None], p_idx[:, None], d_idx[None, :], p_idx[None, :]].set(w)
        # -> [d, e, (p, q, c), F], matching xs's block-to-depth order
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        return jax.lax.conv_general_dilated(
            xs.astype(dt), k.astype(dt), (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )


def max_pool_3x3_s2(x):
    """torch max_pool2d(kernel=3, stride=2, padding=1)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
