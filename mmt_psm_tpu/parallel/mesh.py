"""Device mesh + data-parallel sharding.

The reference's distributed story is NCCL scaffolding that the
mean-teacher path never actually uses for gradients (reference:
tools/train_mean_teacher.py:136-140, utils/comm.py:15-56; see SURVEY.md
§2.2 — no DistributedDataParallel wrap anywhere). The TPU build replaces
it with real data parallelism: params replicated, batch sharded over a
1-D ``data`` mesh axis, gradient all-reduce emerging from XLA's SPMD
partitioner inside one jitted step (collectives ride ICI, not host
gathers). The model is an R-50 CNN (~44M params) so tensor/pipeline
sharding buys nothing at these sizes; scale comes from sharding the
1000x1000 patch stream.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
