"""MTTrainer: the host training loop.

Mirrors the reference MTtrainer (reference:
maskrcnn_benchmark/engine/MTtrainer.py:111-281): supervised step every
iteration; after START_MT (with LAMBDA>0 and unlabeled data) the
combined MMT-PSM step; student checkpoints every CHECKPOINT_PERIOD and
teacher ``t_model_*`` snapshots after START_MT (:222-239); smoothed
loss/time logging every 20 iterations (:204-221).

The device work is two jitted step functions (supervised / MT); the
python loop only feeds batches and handles IO.
"""

from __future__ import annotations

import time
from typing import Iterator

import jax
import jax.numpy as jnp

from ..train.mt_step import MTConfig, make_mt_step
from ..train.optim import make_optimizer
from ..train.supervised import TrainState, create_train_state, make_supervised_step
from ..utils.logger import setup_logger
from ..utils.checkpoint import Checkpointer
from ..utils.metric_logger import MetricLogger


class MTTrainer:
    def __init__(
        self,
        model,
        params,
        cfg,
        source_loader: Iterator,
        unlabeled_loader: Iterator | None = None,
        output_dir: str = ".",
    ):
        self.model = model
        self.cfg = cfg
        self.mt = MTConfig.from_cfg(cfg)
        self.source_loader = source_loader
        self.unlabeled_loader = unlabeled_loader
        self.logger = setup_logger("mmt_psm_tpu.trainer", output_dir)
        self.meters = MetricLogger()
        self.max_iter = cfg.SOLVER.MAX_ITER
        self.checkpoint_period = cfg.SOLVER.CHECKPOINT_PERIOD

        self.tx, self.lr_schedule = make_optimizer(cfg, params)
        self.state = create_train_state(params, self.tx, with_teacher=True)
        self.ckpt_s = Checkpointer(output_dir, "model")
        self.ckpt_t = Checkpointer(output_dir, "t_model")

        self._sup_step = jax.jit(make_supervised_step(self.model, self.tx, ema_alpha=self.mt.alpha))
        self._mt_step = jax.jit(make_mt_step(self.model, self.tx, self.mt)) if unlabeled_loader else None
        self.rng = jax.random.PRNGKey(0)

    def _use_mt(self, iteration: int) -> bool:
        return (
            self._mt_step is not None
            and iteration > self.mt.start_mt
            and self.mt.lambda_ > 0
        )

    def train(self, start_iter: int = 0):
        end = time.time()
        for iteration, batch in enumerate(self.source_loader, start_iter):
            if iteration >= self.max_iter:
                break
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if self._use_mt(iteration):
                ub = next(self.unlabeled_loader)
                ub = {k: jnp.asarray(v) for k, v in ub.items()}
                self.state, metrics = self._mt_step(self.state, batch, ub, self.rng)
            else:
                self.state, metrics = self._sup_step(self.state, batch, self.rng)

            metrics = jax.device_get(metrics)  # one host transfer, not one per scalar
            batch_time = time.time() - end
            end = time.time()
            self.meters.update(time=batch_time, **{k: float(v) for k, v in metrics.items()})

            if iteration % 20 == 0 or iteration == self.max_iter - 1:
                eta = self.meters.meters["time"].global_avg * (self.max_iter - iteration)
                self.logger.info(
                    f"iter: {iteration}  eta: {eta:.0f}s  {self.meters}  "
                    f"lr: {float(self.lr_schedule(iteration)):.6f}"
                )
            if self.checkpoint_period and iteration > 0 and iteration % self.checkpoint_period == 0:
                self.save(iteration)
        self.save(self.max_iter, final=True)
        return self.state

    def save(self, iteration: int, final: bool = False):
        name = "model_final" if final else f"model_{iteration:07d}"
        self.ckpt_s.save(name, {"params": self.state.params, "step": int(self.state.step)})
        if iteration > self.mt.start_mt and self.state.teacher_params is not None:
            tname = "t_model_final" if final else f"t_model_{iteration:07d}"
            self.ckpt_t.save(tname, {"params": self.state.teacher_params, "step": int(self.state.step)}, tag=False)
