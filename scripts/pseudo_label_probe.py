"""Pseudo-label quality probe for the mean-teacher loop.

Trains the supervised warmup exactly as the lift experiment's arms do
(same seeds, same schedule), then runs the teacher pseudo-labeling
pipeline (clean-view inference, the pseudo-gt that
`train/mt_step.py:338-346` feeds to proposal subsampling) on held-out
windows WITH known GT, and reports detection precision/recall at IoU
0.5 plus the score histogram. This answers, with numbers, "were the
pseudo-labels at START_MT good enough for PSM to help?" — the first
thing to check when a lift experiment comes back flat
(reference: engine/MTtrainer.py:247-275).

Usage: python scripts/pseudo_label_probe.py --iters 400
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

from mt_lift_experiment import build_model, init_params


def box_iou(a, b):
    """[N,4] x [M,4] xyxy IoU matrix."""
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.clip(area_a[:, None] + area_b[None] - inter, 1e-9, None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2.5e-4)
    ap.add_argument("--labeled-slides", type=int, default=1)
    ap.add_argument("--out", type=str, default="/tmp/pseudo_probe.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.loader import make_source_loader, make_test_loader
    from mmt_psm_tpu.data.pap import synthetic_slide_dataset
    from mmt_psm_tpu.engine.trainer import MTTrainer

    size = args.size
    model, _ = build_model(size)
    train_ds = synthetic_slide_dataset(
        seed=0, num_slides=args.labeled_slides, slide_size=2 * size, win_size=size, overlap=0.5
    )
    val_ds = synthetic_slide_dataset(
        seed=99, num_slides=8, slide_size=2 * size, win_size=size, overlap=0.0, is_train=False
    )

    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = args.lr
    cfg.SOLVER.MAX_ITER = args.iters
    cfg.SOLVER.STEPS = (10 * args.iters,)  # no decay inside the warmup
    cfg.SOLVER.WARMUP_ITERS = min(100, args.iters // 5)
    cfg.SOLVER.IMS_PER_BATCH = args.batch
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.MT.LAMBDA = 0.0

    loader0 = make_source_loader(train_ds, args.batch, size, max_gt=64, min_size=size, seed=0)
    batch0 = {k: jnp.asarray(v) for k, v in next(loader0).items()}
    params = init_params(model, batch0)
    src = make_source_loader(train_ds, args.batch, size, max_gt=64, min_size=size, seed=0)
    out_dir = "/tmp/pseudo_probe_run"
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    trainer = MTTrainer(model, params, cfg, src, None, output_dir=out_dir)
    state = trainer.train()
    host = jax.device_get(state)
    print(f"warmup: {args.iters} iters in {time.time()-t0:.0f}s", flush=True)

    # the teacher pseudo-gt pipeline == plain test-mode inference
    # (mt_step.py:341-346); measure it against known GT
    infer = jax.jit(lambda p, im, sz: model.apply(p, im, sz, train=False))
    vloader = make_test_loader(val_ds, args.batch, size, max_gt=64, min_size=size)
    stats = {"tp": 0, "fp": 0, "n_gt": 0, "scores_tp": [], "scores_fp": []}
    per_thresh = {t: {} for t in (0.05, 0.3, 0.5, 0.7)}
    for batch in vloader:
        dets = jax.device_get(
            infer({"params": host.params}, jnp.asarray(batch["image"]), jnp.asarray(batch["image_size"]))
        )
        for i in range(len(batch["image"])):
            v = np.asarray(dets.valid[i]).astype(bool)
            boxes = np.asarray(dets.boxes[i])[v]
            scores = np.asarray(dets.scores[i])[v]
            labels = np.asarray(dets.labels[i])[v]
            gv = np.asarray(batch["gt_valid"][i]).astype(bool)
            gboxes = np.asarray(batch["boxes"][i])[gv]
            glabels = np.asarray(batch["labels"][i])[gv]
            stats["n_gt"] += int(gv.sum())
            if len(boxes) == 0:
                continue
            iou = box_iou(boxes, gboxes) if len(gboxes) else np.zeros((len(boxes), 0))
            used = np.zeros(len(gboxes), bool)
            order = np.argsort(-scores)
            for j in order:
                cand = np.flatnonzero(
                    (iou[j] >= 0.5) & ~used & (glabels == labels[j])
                ) if len(gboxes) else []
                hit = len(cand) > 0
                if hit:
                    used[cand[np.argmax(iou[j][cand])]] = True
                    stats["tp"] += 1
                    stats["scores_tp"].append(float(scores[j]))
                else:
                    stats["fp"] += 1
                    stats["scores_fp"].append(float(scores[j]))
                for t in per_thresh:
                    if scores[j] >= t:
                        per_thresh[t]["hit" if hit else "miss"] = per_thresh[t].get(
                            "hit" if hit else "miss", 0
                        ) + 1

    prec = stats["tp"] / max(stats["tp"] + stats["fp"], 1)
    rec = stats["tp"] / max(stats["n_gt"], 1)
    report = {
        "iters": args.iters,
        "precision": round(prec, 4),
        "recall": round(rec, 4),
        "n_gt": stats["n_gt"],
        "n_det": stats["tp"] + stats["fp"],
        "mean_score_tp": round(float(np.mean(stats["scores_tp"])), 4) if stats["scores_tp"] else 0,
        "mean_score_fp": round(float(np.mean(stats["scores_fp"])), 4) if stats["scores_fp"] else 0,
        "by_score_thresh": {
            str(t): {
                "precision": round(
                    d.get("hit", 0) / max(d.get("hit", 0) + d.get("miss", 0), 1), 4
                ),
                "n": d.get("hit", 0) + d.get("miss", 0),
            }
            for t, d in per_thresh.items()
        },
    }
    print(json.dumps(report, indent=2))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
