"""Driver-contract tests for __graft_entry__.py (on the CPU mesh)."""

import importlib.util
import os

import numpy as np
import jax
import pytest


@pytest.fixture(scope="module")
def entry_mod():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_entry_compiles_and_runs(entry_mod):
    fn, args = entry_mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    boxes, scores, labels, masks = out
    assert boxes.shape[-1] == 4
    assert masks.shape[-2:] == (28, 28)
    assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.slow
def test_dryrun_multichip_8(entry_mod):
    entry_mod.dryrun_multichip(8)
