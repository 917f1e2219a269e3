"""Multi-host communication helpers.

Replaces the reference's utils/comm.py (reference:
maskrcnn_benchmark/utils/comm.py:15-147): rank/world helpers, a
synchronize barrier, and an all-gather for eval results. The reference
implements synchronize as a hand-rolled broadcast spin-loop (:33-56)
and scatter_gather through a shared tmpdir (:81-147); here the
device-side collectives are XLA's (inside jit) and host-side sync uses
jax.experimental.multihost_utils over the TPU fabric.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize():
    """Global host barrier (comm.py:33-56 equivalent)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mmt_psm_tpu.synchronize")


def all_gather(data: Any) -> List[Any]:
    """Gather arbitrary picklable data from all hosts (comm.py:81-147
    scatter_gather equivalent, without the tmpdir)."""
    world = get_world_size()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), np.uint8)
    # pad to the max length across hosts
    n = np.asarray([payload.size], np.int64)
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    maxlen = int(sizes.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes()) for i in range(world)
    ]


def reduce_loss_dict(loss_dict: dict) -> dict:
    """Average a dict of scalars across hosts for logging
    (MTtrainer.reduce_loss_dict, MTtrainer.py:16-42)."""
    world = get_world_size()
    if world == 1:
        return dict(loss_dict)
    gathered = all_gather({k: float(v) for k, v in loss_dict.items()})
    out = {}
    for k in loss_dict:
        out[k] = sum(g[k] for g in gathered) / world
    return out
