"""Checkpointing.

Replaces the reference's torch Checkpointer (reference:
maskrcnn_benchmark/utils/checkpoint.py:13-205) with orbax over the
TrainState pytree:

* ``save`` writes params/opt_state/step/teacher + a ``last_checkpoint``
  tag file (checkpoint.py:34-56, 119-142);
* ``load`` resumes from the tag unless an explicit path is given;
* teacher snapshots are saved under the reference's ``t_model_*``
  naming convention (MTtrainer.py:231-239).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, output_dir: str, prefix: str = "model"):
        self.output_dir = os.path.abspath(output_dir)
        self.prefix = prefix
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _tag_file(self):
        return os.path.join(self.output_dir, "last_checkpoint")

    def path(self, name: str) -> str:
        return os.path.join(self.output_dir, name)

    def save(self, name: str, tree: Any, tag: bool = True) -> str:
        """Save a pytree under ``name`` (e.g. model_0000100)."""
        path = self.path(name)
        tree = jax.tree_util.tree_map(np.asarray, tree)
        self._ckptr.save(path, tree, force=True)
        if tag:
            with open(self._tag_file(), "w") as f:
                f.write(name)
        return path

    def has_checkpoint(self) -> bool:
        return os.path.exists(self._tag_file())

    def last_name(self) -> str | None:
        if not self.has_checkpoint():
            return None
        with open(self._tag_file()) as f:
            return f.read().strip()

    def load(self, name: str | None = None, target: Any = None) -> Any:
        """Load by name (or the tagged latest). ``target`` provides the
        pytree structure/dtypes to restore into."""
        name = name or self.last_name()
        if name is None:
            raise FileNotFoundError(f"no checkpoint in {self.output_dir}")
        if target is not None:
            # restore into the target's pytree structure (optax states are
            # namedtuple trees that orbax would otherwise return as dicts)
            item = jax.tree_util.tree_map(np.asarray, target)
            restored = self._ckptr.restore(self.path(name), item=item)
            return jax.tree_util.tree_map(
                lambda t, r: np.asarray(r).astype(np.asarray(t).dtype).reshape(np.shape(t)),
                target,
                restored,
            )
        return self._ckptr.restore(self.path(name))
