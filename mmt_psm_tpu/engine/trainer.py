"""MTTrainer: the host training loop.

Mirrors the reference MTtrainer (reference:
maskrcnn_benchmark/engine/MTtrainer.py:111-281): supervised step every
iteration; after START_MT (with LAMBDA>0 and unlabeled data) the
combined MMT-PSM step; student checkpoints every CHECKPOINT_PERIOD and
teacher ``t_model_*`` snapshots after START_MT (:222-239); smoothed
loss/time logging every 20 iterations (:204-221).

The device work is two jitted step functions (supervised / MT); the
python loop only feeds batches and handles IO. Data parallelism is
SPMD over a 1-D ``data`` mesh built from cfg.TPU.MESH_SHAPE: params
replicated, batches sharded on the leading axis, gradient all-reduce
inserted by XLA (this is *real* DP — the reference's NCCL scaffolding
never synchronized gradients, tools/train_mean_teacher.py:136-140).
"""

from __future__ import annotations

import time
from typing import Iterator

import jax
import jax.numpy as jnp

from ..parallel import make_mesh, replicate, shard_batch
from ..train.mt_step import MTConfig, make_mt_step
from ..train.optim import make_optimizer
from ..train.supervised import create_train_state, make_supervised_step
from ..utils.logger import setup_logger
from ..utils.checkpoint import Checkpointer
from ..utils.metric_logger import MetricLogger


def mesh_size_for(cfg, batch_size: int) -> int:
    """Number of mesh devices: cfg.TPU.MESH_SHAPE[0] (-1 = all available),
    capped to a divisor of the batch size so shards are equal."""
    want = int(cfg.TPU.MESH_SHAPE[0])
    n = jax.device_count() if want == -1 else min(want, jax.device_count())
    n = max(n, 1)
    while batch_size % n:
        n -= 1
    return n


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
        # batch assembly runs ahead in a daemon thread (data/loader.py
        # Prefetcher — the DataLoader-workers analog, reference
        # data/build.py:166-181) so the host's resize/pad/stack numpy
        # overlaps the device step instead of adding to it
        from ..data.loader import prefetch

        depth = int(getattr(cfg.DATALOADER, "PREFETCH_DEPTH", -1))
        self.source_loader = prefetch(source_loader, depth)
        self.unlabeled_loader = (
            prefetch(unlabeled_loader, depth) if unlabeled_loader is not None else None
        )
        self.logger = setup_logger("mmt_psm_tpu.trainer", output_dir)
        self.meters = MetricLogger()
        self.max_iter = cfg.SOLVER.MAX_ITER
        self.checkpoint_period = cfg.SOLVER.CHECKPOINT_PERIOD

        self.tx, self.lr_schedule = make_optimizer(cfg, params)
        self.mesh = make_mesh(mesh_size_for(cfg, cfg.SOLVER.IMS_PER_BATCH))
        self.state = replicate(create_train_state(params, self.tx, with_teacher=True), self.mesh)
        self.ckpt_s = Checkpointer(output_dir, "model")
        self.ckpt_t = Checkpointer(output_dir, "t_model")
        self.logger.info(f"data-parallel mesh: {self.mesh.size} device(s)")

        # the reference EMAs the teacher only when lambda > 0 and
        # iteration > start_mt - 10 (MTtrainer.py:195-196); lambda = 0
        # runs never touch the teacher
        ema_start = (self.mt.start_mt - 10) if self.mt.lambda_ > 0 else None
        self._sup_step = jax.jit(
            make_supervised_step(
                self.model, self.tx, ema_alpha=self.mt.alpha, ema_start=ema_start
            )
        )
        self._mt_step = jax.jit(make_mt_step(self.model, self.tx, self.mt)) if unlabeled_loader else None
        self.rng = replicate(jax.random.PRNGKey(0), self.mesh)

    def _use_mt(self, iteration: int) -> bool:
        return (
            self._mt_step is not None
            and iteration > self.mt.start_mt
            and self.mt.lambda_ > 0
        )

    def resume(self) -> int:
        """Restore the tagged last checkpoint (reference
        utils/checkpoint.py:119-142). Returns the iteration to resume at."""
        if not self.ckpt_s.has_checkpoint():
            return 0
        name = self.ckpt_s.last_name()
        host_state = jax.device_get(self.state)
        restored = self.ckpt_s.load(name, target=self._save_tree(host_state))
        self.state = replicate(
            host_state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                step=jnp.asarray(restored["step"], jnp.int32),
                teacher_params=restored["teacher_params"],
            ),
            self.mesh,
        )
        start = int(restored["step"])
        self.logger.info(f"resumed from {name} at iteration {start}")
        return start

    def train(self, start_iter: int = 0):
        end = time.time()
        prof_dir = getattr(self.cfg.TPU, "PROFILE_DIR", "")
        prof_start = getattr(self.cfg.TPU, "PROFILE_START", 5)
        prof_stop = prof_start + getattr(self.cfg.TPU, "PROFILE_STEPS", 3)
        profiling = False
        for iteration, batch in enumerate(self.source_loader, start_iter):
            if iteration >= self.max_iter:
                break
            # jax.profiler trace window (TPU tracing subsystem; the
            # reference has wall-clock meters only, MTtrainer.py:198-221)
            if prof_dir and iteration == prof_start and not profiling:
                jax.profiler.start_trace(prof_dir)
                profiling = True
            if profiling and iteration >= prof_stop:
                jax.profiler.stop_trace()
                profiling = False
                self.logger.info(f"profiler trace written to {prof_dir}")
            batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, self.mesh)
            if self._use_mt(iteration):
                ub = next(self.unlabeled_loader)
                ub = shard_batch({k: jnp.asarray(v) for k, v in ub.items()}, self.mesh)
                with self.mesh:
                    self.state, metrics = self._mt_step(self.state, batch, ub, self.rng)
            else:
                with self.mesh:
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
        if profiling:
            jax.profiler.stop_trace()
        self.save(self.max_iter, final=True)
        return self.state

    @staticmethod
    def _save_tree(state):
        """Full resume payload: model + optimizer + step + teacher
        (reference Checkpointer saves model/optimizer/scheduler,
        utils/checkpoint.py:34-56)."""
        return {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": int(state.step),
            "teacher_params": state.teacher_params,
        }

    def save(self, iteration: int, final: bool = False):
        host_state = jax.device_get(self.state)
        name = "model_final" if final else f"model_{iteration:07d}"
        self.ckpt_s.save(name, self._save_tree(host_state))
        if iteration > self.mt.start_mt and host_state.teacher_params is not None:
            tname = "t_model_final" if final else f"t_model_{iteration:07d}"
            self.ckpt_t.save(tname, {"params": host_state.teacher_params, "step": int(host_state.step)}, tag=False)
