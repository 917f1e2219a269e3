"""Backbone gradient checkpointing (TPU.REMAT_BACKBONE).

``nn.remat`` on the bottleneck blocks must be a pure execution-plan
change: identical param structure (checkpoints interchangeable),
identical forward, and gradients equal to the non-remat VJP up to
recompute-order float noise. Measured role (RESULTS.md "Backbone remat
A/B"): −39% peak temp memory for +3% step time — a memory-headroom
knob, default off.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mmt_psm_tpu.models import MaskRCNN

from test_detector import TINY, _batch

import dataclasses


def _loss_and_grad(config, params, images, sizes, gt):
    model = MaskRCNN(config=config)

    def loss_fn(p):
        losses = model.apply(
            {"params": p},
            images,
            sizes,
            gt,
            train=True,
            rngs={"sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        )
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

    return jax.jit(jax.value_and_grad(loss_fn))(params)


def test_remat_param_structure_and_grads_match():
    remat_cfg = dataclasses.replace(TINY, remat_backbone=True)
    images, sizes, gt = _batch()

    base = MaskRCNN(config=TINY)
    params = base.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, train=True,
    )["params"]

    # identical param tree: a non-remat checkpoint loads into the remat
    # model verbatim (and vice versa)
    remat_params = MaskRCNN(config=remat_cfg).init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, train=True,
    )["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(remat_params)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(remat_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    loss0, g0 = _loss_and_grad(TINY, params, images, sizes, gt)
    loss1, g1 = _loss_and_grad(remat_cfg, params, images, sizes, gt)

    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for (path, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )
