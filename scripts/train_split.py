"""Supervised train-step forward/backward split on the real chip.

Times (a) the loss-only forward and (b) the full value_and_grad at the
flagship schedule shapes (b4, 1024), steady-state with the same
dispatch-queue methodology as bench.py. backward ~= (b) - (a). Used to
name the dominant term left in the 352.6 ms MT step after the windowed
scatter-add pooling backward (VERDICT r3 item 2's "name the true next
bottleneck").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig
    from mmt_psm_tpu.train.supervised import batch_to_gt

    batch, size = 4, 1024
    ycfg = get_cfg()
    ycfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs/pap/mmt_psm_r50_fpn.yaml")
    )
    cfg = ModelConfig.from_cfg(ycfg, train=True)
    model = MaskRCNN(config=cfg)

    b = generate_batch(0, batch, image_size=size, max_instances=64)
    b["image"] = normalize_image(b["image"])
    jb = {k: jnp.asarray(v) for k, v in b.items()}
    gt = batch_to_gt(jb)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params = jax.jit(
        lambda: model.init(rngs, jb["image"], jb["image_size"], gt, train=True)
    )()["params"]

    def loss_fn(p, image, image_size, gt):
        losses = model.apply(
            {"params": p}, image, image_size, gt, train=True,
            rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        )
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

    # batch passed as jit ARGUMENTS — closing over it would bake 200 MB
    # of image literals into the HLO (the remote compile endpoint 413s)
    fwd = jax.jit(loss_fn)

    def vg_fn(p, im, sz, g):
        # return a reduction OVER THE GRADS, not just the loss: returning
        # value_and_grad(...)[0] alone lets XLA dead-code-eliminate the
        # entire backward (verified: compiled FLOPs collapse to the
        # forward's), which would make the fwd/bwd split here fictional
        loss, grads = jax.value_and_grad(loss_fn)(p, im, sz, g)
        return loss, sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(grads))

    vg = jax.jit(vg_fn)

    args = (params, jb["image"], jb["image_size"], gt)
    t_fwd = timeit(fwd, *args)
    t_vg = timeit(vg, *args)
    for name, fn in (("fwd", fwd), ("fwd+bwd", vg)):
        c = fn.lower(*args).compile().cost_analysis()
        gf = (c.get("flops", 0.0) or 0.0) / 1e9
        print(json.dumps({"stage": name, "gflop": round(gf, 1)}))
    print(json.dumps({
        "fwd_ms": round(t_fwd, 1),
        "fwd_bwd_ms": round(t_vg, 1),
        "bwd_ms": round(t_vg - t_fwd, 1),
        "batch": batch,
    }))


if __name__ == "__main__":
    main()
