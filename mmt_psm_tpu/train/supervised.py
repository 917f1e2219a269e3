"""Supervised training step (the MT.LAMBDA=0 path).

Mirrors the labeled-batch branch of the reference trainer (reference:
maskrcnn_benchmark/engine/MTtrainer.py:165-196 via forward_source
:241-245): forward, sum the loss dict, SGD step, optional teacher EMA.
The whole step — including the teacher update — is one jitted function.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..structures.detections import GroundTruth
from .ema import ema_update


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    teacher_params: Any = None


def create_train_state(params, tx, with_teacher: bool = False) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        teacher_params=jax.tree_util.tree_map(jnp.copy, params) if with_teacher else None,
    )


def batch_to_gt(batch) -> GroundTruth:
    return GroundTruth(
        boxes=batch["boxes"],
        labels=batch["labels"],
        valid=batch["gt_valid"],
        masks=batch.get("masks"),
    )


def make_supervised_step(
    model, tx, ema_alpha: float | None = None, ema_start: int | None = None
):
    """Returns a jittable (state, batch, rng) -> (state, metrics) step.

    ``ema_start``: first-iteration gate for the teacher EMA. The
    reference only updates the teacher when ``lambda > 0 and
    iteration > start_mt - 10`` and counts the EMA iteration from that
    point (MTtrainer.py:195-196) — so during an MT run's warmup the
    teacher stays at init until ``start_mt - 10``, then snaps to the
    student over ~10 aggressive small-``i`` updates. Pass
    ``ema_start = start_mt - 10`` when lambda > 0, and ``None`` (no EMA
    at all) for pure supervised runs, matching the reference exactly.
    """

    def step_fn(state: TrainState, batch, rng):
        gt = batch_to_gt(batch)
        r_sample, r_drop = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(p):
            losses = model.apply(
                {"params": p},
                batch["image"],
                batch["image_size"],
                gt,
                train=True,
                rngs={"sample": r_sample, "dropout": r_drop},
            )
            total = sum(jnp.asarray(v, jnp.float32) for v in losses.values())
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        teacher = state.teacher_params
        if teacher is not None and ema_alpha is not None and ema_start is not None:
            gate = jnp.asarray(ema_start, jnp.int32)
            do_ema = state.step > gate
            ema_iter = jnp.maximum(state.step - gate, 0)
            new_teacher = ema_update(teacher, params, ema_iter, ema_alpha)
            teacher = jax.tree_util.tree_map(
                lambda t_new, t_old: jnp.where(do_ema, t_new, t_old), new_teacher, teacher
            )

        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1, teacher_params=teacher
        )
        metrics = dict(losses)
        metrics["loss_total"] = total
        return new_state, metrics

    return step_fn
