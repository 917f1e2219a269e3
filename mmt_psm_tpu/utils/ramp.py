"""Consistency-weight ramp schedules.

Same curves as the reference (reference:
maskrcnn_benchmark/utils/miscellaneous.py:233-262); implemented with
jnp so they can live inside a jitted train step with the iteration as a
traced scalar.
"""

from __future__ import annotations

import jax.numpy as jnp


def sigmoid_rampup(current, rampup_length):
    """exp(-5 (1 - t)^2), t in [0, 1]."""
    if rampup_length == 0:
        return jnp.asarray(1.0)
    t = jnp.clip(current / rampup_length, 0.0, 1.0)
    phase = 1.0 - t
    return jnp.exp(-5.0 * phase * phase)


def sigmoid_rampdown(gap_time, rampdown_length):
    """exp(-12 (1 - g/L)^2) — the reference does NOT clip the phase
    (miscellaneous.py:242-247); for gap_time >= L this saturates to 1."""
    if rampdown_length == 0:
        return jnp.asarray(1.0)
    phase = 1.0 - gap_time / rampdown_length
    return jnp.exp(-12.0 * phase * phase)


def linear_rampup(current, rampup_length):
    if rampup_length == 0:
        return jnp.asarray(1.0)
    return jnp.clip(current / rampup_length, 0.0, 1.0)


def cosine_rampdown(current, rampdown_length):
    return 0.5 * (jnp.cos(jnp.pi * current / rampdown_length) + 1.0)
