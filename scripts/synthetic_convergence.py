"""Train supervised on synthetic cells, then report AJI/mAP (dev tool).

Validates that the full stack *learns*: the detector trains from random
init on synthetic overlapping-cell slides and is scored with the
Papeval stack. Writes a JSON summary.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2.5e-4)
    ap.add_argument("--out", type=str, default="/tmp/synth_convergence.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.loader import make_source_loader, make_test_loader
    from mmt_psm_tpu.data.pap import synthetic_slide_dataset
    from mmt_psm_tpu.engine.inference import run_inference
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig
    from mmt_psm_tpu.train.optim import make_optimizer
    from mmt_psm_tpu.train.supervised import batch_to_gt, create_train_state, make_supervised_step

    size = args.size
    mcfg = ModelConfig(
        image_size=size,
        pre_nms_top_n_train=1024,
        pre_nms_top_n_test=512,
        post_nms_top_n_train=512,
        post_nms_top_n_test=512,
        fpn_post_nms_top_n_train=1024,
        fpn_post_nms_top_n_test=512,
        box_batch_per_image=256,
        mask_max_pos=64,
        detections_per_img=100,
    )
    model = MaskRCNN(config=mcfg)

    train_ds = synthetic_slide_dataset(seed=0, num_slides=8, slide_size=2 * size, win_size=size, overlap=0.5)
    val_ds = synthetic_slide_dataset(seed=99, num_slides=2, slide_size=2 * size, win_size=size, overlap=0.0, is_train=False)
    print(f"train windows: {len(train_ds)}, val windows: {len(val_ds)}")

    loader = make_source_loader(train_ds, args.batch, size, max_gt=64, min_size=size, seed=0)
    first = next(loader)
    batch0 = {k: jnp.asarray(v) for k, v in first.items()}
    init_fn = jax.jit(lambda r, im, sz, gt: model.init(r, im, sz, gt, train=True))
    params = init_fn(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch0["image"], batch0["image_size"], batch_to_gt(batch0),
    )["params"]

    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = args.lr
    cfg.SOLVER.STEPS = (int(args.iters * 0.7),)
    cfg.SOLVER.WARMUP_ITERS = min(100, args.iters // 5)
    tx, sched = make_optimizer(cfg, params)
    state = create_train_state(params, tx)
    step = jax.jit(make_supervised_step(model, tx))

    rng = jax.random.PRNGKey(7)
    t0 = time.time()
    batch = batch0
    for i in range(args.iters):
        state, metrics = step(state, batch, rng)
        if i % 25 == 0:
            m = jax.device_get(metrics)
            print(i, {k: round(float(v), 3) for k, v in m.items()}, flush=True)
        batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
    train_time = time.time() - t0

    loader_val = make_test_loader(val_ds, args.batch, size, max_gt=64, min_size=size)
    stats, timing = run_inference(model, {"params": state.params}, loader_val)
    result = {
        "iters": args.iters,
        "train_seconds": round(train_time, 1),
        "sec_per_iter": round(train_time / args.iters, 3),
        "AJI": {str(k): round(v, 4) for k, v in stats["AJI"].items()},
        "F1": {str(k): round(v, 4) for k, v in stats["F1"].items()},
        "mAP_all": round(stats["mAP"].get("all", -1), 4),
        "AP50_all": round(stats["AP50"].get("all", -1), 4),
        "eval_images_per_sec": round(timing["images_per_sec"], 2),
    }
    print(json.dumps(result, indent=2))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
