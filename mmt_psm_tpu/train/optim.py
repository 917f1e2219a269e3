"""SGD + warmup multistep LR with the reference's param-group rules.

Parity with the reference solver (reference:
maskrcnn_benchmark/solver/build.py:5-34, solver/lr_scheduler.py:10-53):
* SGD, momentum 0.9;
* biases get lr x BIAS_LR_FACTOR and WEIGHT_DECAY_BIAS;
* linear warmup from WARMUP_FACTOR over WARMUP_ITERS then x GAMMA at
  each milestone;
* frozen params (FrozenBN buffers, stages below FREEZE_CONV_BODY_AT)
  receive no updates — the torch requires_grad=False equivalent.

torch SGD semantics reproduced exactly: v <- mu*v + (g + wd*p);
p <- p - lr_group * v (weight decay enters the momentum buffer, and the
group lr scales the traced update).
"""

from __future__ import annotations

import re
from typing import Callable

import jax
import jax.numpy as jnp
import optax

_BN_RE = re.compile(r"^(bn\d|downsample_bn)$")


def path_is_frozen_bn(path) -> bool:
    return any(_BN_RE.match(str(p)) for p in path)


def path_is_frozen_stage(path, freeze_at: int) -> bool:
    parts = [str(p) for p in path]
    if "stem" in parts and freeze_at >= 1:
        return True
    for p in parts:
        m = re.match(r"^layer(\d)_\d+$", p)
        if m and int(m.group(1)) < freeze_at:
            return True
    return False


def _tree_path_map(params, fn: Callable):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    vals = [fn(tuple(getattr(k, "key", getattr(k, "idx", k)) for k in path), v) for path, v in flat]
    return jax.tree_util.tree_unflatten(treedef, vals)


def trainable_mask(params, freeze_at: int = 2):
    """True where the param should be updated."""

    def fn(path, v):
        return not (path_is_frozen_bn(path) or path_is_frozen_stage(path, freeze_at))

    return _tree_path_map(params, fn)


def bias_mask(params):
    def fn(path, v):
        return str(path[-1]) == "bias"

    return _tree_path_map(params, fn)


def warmup_multistep_schedule(base_lr, steps, gamma=0.1, warmup_factor=1.0 / 3, warmup_iters=500, warmup_method="linear"):
    steps = tuple(int(s) for s in steps)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        if warmup_method == "constant":
            wf = jnp.where(count < warmup_iters, warmup_factor, 1.0)
        else:
            alpha = count / max(warmup_iters, 1)
            wf = jnp.where(count < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0)
        decay = jnp.asarray(1.0)
        for s in steps:
            decay = decay * jnp.where(count >= s, gamma, 1.0)
        return base_lr * wf * decay

    return schedule


def make_optimizer(cfg, params):
    """Build the optax transform + schedule from the SOLVER config block."""
    schedule = warmup_multistep_schedule(
        cfg.SOLVER.BASE_LR,
        cfg.SOLVER.STEPS,
        cfg.SOLVER.GAMMA,
        cfg.SOLVER.WARMUP_FACTOR,
        cfg.SOLVER.WARMUP_ITERS,
        cfg.SOLVER.WARMUP_METHOD,
    )
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT
    train_mask = trainable_mask(params, freeze_at)
    b_mask = bias_mask(params)
    nonbias_mask = jax.tree_util.tree_map(lambda b: not b, b_mask)
    bias_factor = float(cfg.SOLVER.BIAS_LR_FACTOR)

    chain = []
    clip = float(cfg.SOLVER.get("CLIP_GRAD_NORM", 0.0) or 0.0)
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY, mask=nonbias_mask))
    if cfg.SOLVER.WEIGHT_DECAY_BIAS:
        chain.append(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY_BIAS, mask=b_mask))
    chain.append(optax.trace(decay=cfg.SOLVER.MOMENTUM))
    if bias_factor != 1.0:
        chain.append(
            optax.masked(optax.scale(bias_factor), b_mask)
        )
    chain.append(optax.scale_by_schedule(lambda c: -schedule(c)))
    # zero out updates for frozen params (torch requires_grad=False)
    frozen = jax.tree_util.tree_map(lambda t: not t, train_mask)
    chain.append(optax.masked(optax.set_to_zero(), frozen))
    return optax.chain(*chain), schedule
