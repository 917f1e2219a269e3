"""Feature Pyramid Network.

Parity with reference FPN (reference:
maskrcnn_benchmark/modeling/backbone/fpn.py:7-74): 1x1 lateral convs,
nearest x2 top-down, 3x3 output convs, plus LastLevelMaxPool — which is
max_pool(kernel=1, stride=2), i.e. plain ::2 subsampling (fpn.py:72-74).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import conv


def _upsample2x_nearest(x):
    """Exact nearest-neighbor x2 (torch F.interpolate scale_factor=2)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    out_channels: int = 256
    use_p6: bool = True  # LastLevelMaxPool
    dtype: object = None

    @nn.compact
    def __call__(self, features):
        n = len(features)
        # kaiming_uniform(a=1) init as the reference notes matches XavierFill
        # (fpn.py:33-36); variance_scaling uniform fan_in is the flax analog.
        init = nn.initializers.variance_scaling(1.0 / 3, "fan_in", "uniform")

        inners = [
            nn.Conv(self.out_channels, (1, 1), padding="VALID", kernel_init=init, dtype=self.dtype, name=f"fpn_inner{i+1}")
            for i in range(n)
        ]
        layers = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=init, dtype=self.dtype, name=f"fpn_layer{i+1}")
            for i in range(n)
        ]

        last_inner = inners[-1](features[-1])
        results = [layers[-1](last_inner)]
        for i in range(n - 2, -1, -1):
            top_down = _upsample2x_nearest(last_inner)
            lateral = inners[i](features[i])
            last_inner = lateral + top_down
            results.insert(0, layers[i](last_inner))

        if self.use_p6:
            results.append(results[-1][:, ::2, ::2, :])
        return tuple(results)
