"""Train-step throughput bench (VERDICT r2 item 7).

Measures the two production training steps at the reference's schedule
shapes (scripts/train_mt.sh: batch 4, 1024 canvas, AUG_K=2 teacher
views + 1 student view):

* supervised step (backbone+RPN+box+mask losses, SGD, EMA update);
* full MMT-PSM step (supervised + teacher pseudo-labeling inference +
  PSM + MGD + EMA — engine/MTtrainer.py:165-281's per-iteration work).

Prints one JSON line per metric:
{"metric": ..., "value": N, "unit": "ms/iter", "vs_baseline": N}
``vs_baseline`` compares against the reference's logged ~1.2 s/it GPU
training cadence (MTtrainer.py:226-229 meters; BASELINE.md discussion),
i.e. value/1200 < 1 means faster than the reference loop.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_MS_PER_IT = 1200.0  # reference 1-GPU MT loop cadence (order of magnitude)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--remat", action="store_true",
        help="gradient-checkpoint backbone blocks (TPU.REMAT_BACKBONE A/B)",
    )
    ap.add_argument("--batch", type=int, default=4, help="images per step")
    ap.add_argument(
        "--sup-only", action="store_true", help="skip the (slow-compile) MT step"
    )
    cli = ap.parse_args()

    # no persistent compile cache here — see the note in bench.py (cache
    # serialization contends with the timed dispatch loop on this host)
    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig
    from mmt_psm_tpu.train.mt_step import MTConfig, make_mt_step
    from mmt_psm_tpu.train.optim import make_optimizer
    from mmt_psm_tpu.train.supervised import (
        batch_to_gt,
        create_train_state,
        make_supervised_step,
    )

    batch, size = cli.batch, 1024
    ycfg = get_cfg()
    ycfg.merge_from_file("configs/pap/mmt_psm_r50_fpn.yaml")
    if cli.remat:
        ycfg.TPU.REMAT_BACKBONE = True
    cfg = ModelConfig.from_cfg(ycfg, train=True)
    assert cfg.image_size == 1024
    model = MaskRCNN(config=cfg)

    b = generate_batch(0, batch, image_size=size, max_instances=64)
    labeled = {
        "image": jnp.asarray(normalize_image(b["image"])),
        "image_size": jnp.asarray(b["image_size"]),
        "boxes": jnp.asarray(b["boxes"]),
        "labels": jnp.asarray(b["labels"]),
        "gt_valid": jnp.asarray(b["gt_valid"]),
        "masks": jnp.asarray(b["masks"]),
    }
    bu = generate_batch(1, batch, image_size=size, max_instances=64)
    base = normalize_image(bu["image"])
    rngn = np.random.default_rng(3)
    unlabeled = {
        "t_images": jnp.asarray(
            np.stack([base + rngn.normal(0, 4, base.shape) for _ in range(2)], 1), jnp.float32
        ),
        "s_images": jnp.asarray(
            np.stack([base + rngn.normal(0, 4, base.shape)], 1), jnp.float32
        ),
        "image_size": jnp.asarray(bu["image_size"]),
    }

    init_fn = jax.jit(lambda r, im, sz, gt: model.init(r, im, sz, gt, method=model.init_all))
    params = init_fn(
        {
            "params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
        },
        labeled["image"][:1],
        labeled["image_size"][:1],
        batch_to_gt({k: v[:1] for k, v in labeled.items()}),
    )["params"]

    tx, _ = make_optimizer(get_cfg(), params)
    mt = MTConfig.from_cfg(get_cfg())
    state = create_train_state(params, tx, with_teacher=True)
    state = state.replace(step=jnp.asarray(mt.start_mt + 1, jnp.int32))

    rng = jax.random.PRNGKey(7)

    def step_flops(compiled):
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", float("nan")))

    def bench(step_fn, args, iters=10):
        s = state
        for _ in range(2):  # compile + warmup
            s, m = step_fn(s, *args)
        float(jax.tree_util.tree_leaves(m)[0])
        t0 = time.perf_counter()
        ms = []
        for _ in range(iters):
            s, m = step_fn(s, *args)
            ms.append(jax.tree_util.tree_leaves(m)[0])
        float(jnp.stack(ms).sum())  # one draining read
        return (time.perf_counter() - t0) / iters * 1000

    # Compile-then-bench each step in sequence: benching the supervised
    # step with the (much larger) MT executable already resident was
    # measured 5.5x slower than benching it alone (206 ms -> 1146 ms on
    # the same chip) — keep each program's bench window clean.
    sup_step = (
        jax.jit(
            make_supervised_step(
                model, tx, ema_alpha=mt.alpha, ema_start=mt.start_mt - 10
            )
        )
        .lower(state, labeled, rng)
        .compile()
    )
    sup_ms = bench(sup_step, (labeled, rng))
    sup_fl = step_flops(sup_step)
    del sup_step

    rows = [("supervised_train_step", sup_ms, sup_fl)]
    if not cli.sup_only:
        mt_step = (
            jax.jit(make_mt_step(model, tx, mt))
            .lower(state, labeled, unlabeled, rng)
            .compile()
        )
        mt_ms = bench(mt_step, (labeled, unlabeled, rng))
        mt_fl = step_flops(mt_step)
        rows.append(("mmt_psm_train_step", mt_ms, mt_fl))

    PEAK_BF16 = 197e12  # v5e bf16 peak FLOP/s
    for name, ms, fl in rows:
        print(
            json.dumps(
                {
                    "metric": f"{name}_b{batch}_1024",
                    "value": round(ms, 1),
                    "unit": "ms/iter",
                    "vs_baseline": round(REF_MS_PER_IT / ms, 2),
                    "gflop_per_iter": round(fl / 1e9, 1),
                    "mfu": round(fl / (ms / 1e3) / PEAK_BF16, 4),
                }
            )
        )


if __name__ == "__main__":
    main()
