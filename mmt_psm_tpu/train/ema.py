"""Teacher EMA update.

Same rule as the reference mean-teacher (reference:
maskrcnn_benchmark/engine/MTtrainer.py:277-281):
``alpha = min(1 - 1/(iter + 1), alpha_max)`` then
``teacher = alpha * teacher + (1 - alpha) * student`` — a pure pytree
op, jit-safe with a traced iteration scalar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(teacher_params, student_params, iteration, alpha_max: float):
    alpha = jnp.minimum(1.0 - 1.0 / (iteration.astype(jnp.float32) + 1.0), alpha_max)
    return jax.tree_util.tree_map(
        lambda t, s: alpha * t + (1.0 - alpha) * s, teacher_params, student_params
    )
