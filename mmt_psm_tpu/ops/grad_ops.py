"""Gradient manipulation ops.

``gradient_reversal`` ports the reference's GradientReversal layer
(reference: maskrcnn_benchmark/modeling/utils.py:19-47) used by the
MT.ADV adversarial branch (unused in the pap path but part of the API).
"""

from __future__ import annotations

import jax


@jax.custom_vjp
def gradient_reversal(x, scale: float = 1.0):
    return x


def _fwd(x, scale):
    return x, scale


def _bwd(scale, g):
    return (-scale * g, None)


gradient_reversal.defvjp(_fwd, _bwd)
