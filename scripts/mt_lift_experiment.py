"""Semi-supervised lift experiment: supervised-only vs full MMT-PSM.

The reference exists to show that the mean-teacher loop (PSM + MGD, EMA
teacher — engine/MTtrainer.py:111-281, box_head/loss.py:185-237,
generalized_rcnn.py:243-282) buys accuracy from unlabeled data. This
script reproduces that claim end to end on synthetic pap data:

* a SMALL labeled split (few slides — the supervised baseline overfits),
* a LARGE unlabeled patch pool,
* arm A: supervised-only training (MT.LAMBDA=0 semantics);
* arm B: identical init + schedule, with the MMT-PSM unlabeled step
  after START_MT (teacher pseudo-labels its clean view, PSM soft-CE
  with hard-negative selection, MGD foreground hints, EMA teacher);
* both arms evaluated on held-out slides with the Papeval stack.

Writes a JSON summary {sup: {...}, mt_student: {...}, mt_teacher: {...}}
consumed by tests/test_mt_lift.py, which asserts the teacher's lift.
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


def build_model(size, with_hint: bool = False):
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig

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
        with_hint_adaptor=with_hint,
    )
    return MaskRCNN(config=mcfg), mcfg


def init_params(model, batch0, seed: int = 0):
    from mmt_psm_tpu.train.supervised import batch_to_gt

    # init_all touches every submodule (incl. the MGD hint adaptor,
    # which the plain train forward never calls)
    init_fn = jax.jit(lambda r, im, sz, gt: model.init(r, im, sz, gt, method=model.init_all))
    return init_fn(
        {
            "params": jax.random.PRNGKey(seed),
            "sample": jax.random.PRNGKey(seed + 1),
            "dropout": jax.random.PRNGKey(seed + 2),
        },
        batch0["image"],
        batch0["image_size"],
        batch_to_gt(batch0),
    )["params"]


def evaluate(model, params, loader):
    from mmt_psm_tpu.engine.inference import run_inference

    stats, _ = run_inference(model, {"params": params}, loader)
    return {
        "AJI_cyto": round(float(stats["AJI"].get(1, 0.0)), 4),
        "AJI_nuclei": round(float(stats["AJI"].get(2, 0.0)), 4),
        "mAP_all": round(float(stats["mAP"].get("all", -1)), 4),
        "AP50_all": round(float(stats["AP50"].get("all", -1)), 4),
        "F1_nuclei": round(float(stats["F1"].get(2, 0.0)), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1800)
    ap.add_argument("--start-mt", type=int, default=400)
    ap.add_argument("--size", type=int, default=256)
    # model canvas (0 = same as --size). The flagship regime windows at
    # 1000 (reference Pap.py:26-31) but pads to a /32-divisible 1024
    # canvas (SIZE_DIVISIBILITY) — pass --size 1000 --canvas 1024.
    ap.add_argument("--canvas", type=int, default=0)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2.5e-4)
    ap.add_argument("--labeled-slides", type=int, default=1)
    # keep only the first fraction of the labeled slide's windows
    # (PapNucleiSourceDataset ratio subsetting, Pap.py:494-496) — the
    # label-scarce regime where the reference's semi-supervised claim
    # lives (paper uses small labeled fractions of the pap corpus)
    ap.add_argument("--train-ratio", type=float, default=0.45)
    ap.add_argument("--unlabeled-patches", type=int, default=192)
    # FG_HINT 0.05 = MGD foreground-hint weight from the reference
    # authors' own run names (configs/pap yaml WEIGHT comment:
    # "relation_F150_M0_FG0.05_...")
    ap.add_argument("--fg-hint", type=float, default=0.05)
    # an upper-bound arm: supervised on this many fully-labeled slides
    # (0 = skip); brackets the headroom the MT arm can capture
    ap.add_argument("--oracle-slides", type=int, default=0)
    # the reference's released pap config trains with LAMBDA = 1.0
    # (configs/pap/e2e_mask_rcnn_R_50_FPN_1x.yaml MT block)
    # the authors' own run names record la2.0 (config WEIGHT comment);
    # the released yaml ships LAMBDA 1.0 — 2.0 is their trained setting
    ap.add_argument("--lambda", dest="lam", type=float, default=2.0)
    # 0.99 is the reference's own trained setting (scripts/train_mt.sh
    # MT.ALPHA 0.99). Horizon must scale with the schedule: at 0.999 in
    # a 1200-iter run the teacher EMAs the whole from-scratch warmup and
    # lands far below its student (measured 0.419 vs 0.465 AJI); at 0.99
    # it leads the student (measured 0.5967 vs 0.5946, v4)
    ap.add_argument("--alpha", type=float, default=0.99)
    # PSM's paper-described components (sharpened soft targets,
    # highest-std hard-negative mining); the released yaml ships them
    # off but the golden-parity tests cover both paths
    ap.add_argument("--sharpen", action="store_true")
    ap.add_argument("--hard-neg", action="store_true")
    # comma-separated subset of {sup,mt,oracle,odkd,psm,mgd} to (re-)run; arms are
    # deterministic given seeds, so unchanged arms can reuse prior numbers
    ap.add_argument("--arms", type=str, default="")
    # seed offset for robustness replicas: shifts the labeled/unlabeled
    # generators and the init/train PRNGs together (val slides stay at
    # their fixed seed so replicas share the held-out split)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="/tmp/mt_lift.json")
    # pretrained-transfer regime: initialize every arm from a saved
    # checkpoint instead of random init — the reference always fine-tunes
    # from COCO weights (reference tools/train_mean_teacher.py:41-43);
    # pass e.g. an oracle arm's final student trained on DIFFERENT slide
    # seeds as the stand-in for e2e_mask_rcnn_R_50_FPN_1x.pth
    ap.add_argument("--init-from", type=str, default="")
    # distinct checkpoint-dir suffix so variant runs (e.g. pretrained-
    # init) never auto-resume from an earlier run's saves
    ap.add_argument("--tag", type=str, default="")
    # periodic checkpointing + auto-resume so a cut-off run restarts from
    # its last save, not from scratch (resume replays the loader from its
    # start, so a resumed run sees a shifted batch order vs a straight one)
    ap.add_argument("--ckpt-period", type=int, default=600)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # restarts/evals of unchanged programs hit disk instead of paying the
    # 1024-canvas compile again (~28 min observed on the contended host)
    from mmt_psm_tpu.utils.env import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.loader import (
        make_source_loader,
        make_test_loader,
        make_unlabeled_loader,
    )
    from mmt_psm_tpu.data.pap import PapUnlabeledDataset, synthetic_slide_dataset
    from mmt_psm_tpu.data.synthetic import generate_sample
    from mmt_psm_tpu.engine.trainer import MTTrainer

    size = args.size
    canvas = args.canvas or size
    assert canvas % 32 == 0 and canvas >= size, (size, canvas)
    model, _ = build_model(canvas, with_hint=args.fg_hint > 0)
    eval_model, _ = build_model(canvas, with_hint=False)

    # labeled: a few windows of one slide — the label-scarce regime
    train_ds = synthetic_slide_dataset(
        seed=args.seed, num_slides=args.labeled_slides, slide_size=2 * size, win_size=size,
        overlap=0.5, train_ratio=args.train_ratio,
    )
    # unlabeled: large pool from the SAME generative distribution
    # (different seed), as loose patches (reference Pap.py:762-866)
    rng = np.random.default_rng(50 + args.seed)
    patches = [
        generate_sample(rng, image_size=size, max_instances=64, num_cells=(4, 10)).image.astype(np.uint8)
        for _ in range(args.unlabeled_patches)
    ]
    unlabeled_ds = PapUnlabeledDataset(patches)
    val_ds = synthetic_slide_dataset(
        seed=99, num_slides=8, slide_size=2 * size, win_size=size, overlap=0.0, is_train=False
    )
    print(
        f"labeled windows: {len(train_ds)}, unlabeled patches: {len(unlabeled_ds)}, "
        f"val windows: {len(val_ds)}",
        flush=True,
    )

    def make_cfg(with_mt: bool, out_dir: str, odkd: bool = False, arm: str = ""):
        cfg = get_cfg()
        cfg.SOLVER.BASE_LR = args.lr
        cfg.SOLVER.MAX_ITER = args.iters
        cfg.SOLVER.STEPS = (int(args.iters * 0.75),)
        cfg.SOLVER.WARMUP_ITERS = min(100, args.iters // 5)
        cfg.SOLVER.IMS_PER_BATCH = args.batch
        cfg.SOLVER.CHECKPOINT_PERIOD = args.ckpt_period
        cfg.MT.LAMBDA = args.lam if with_mt else 0.0
        # the odkd arm swaps MGD for the baseline's naive unmasked hint
        # (both flags are independent in the reference — forward_student
        # generalized_rcnn.py:177-189 — but the paper's comparison row
        # is ODKD-without-MGD)
        cfg.MT.FG_HINT = args.fg_hint if (with_mt and not odkd) else 0.0
        # component-decomposition arms (the paper's Table-2 axis):
        # psm = PSM soft-matching consistency alone (MGD hint off);
        # mgd = MGD masked feature distillation alone (PSM cls loss off —
        # CLS_LOSS gates mt_classifier, box_head/loss.py:185-237)
        if arm == "psm":
            cfg.MT.FG_HINT = 0.0
        elif arm == "mgd":
            cfg.MT.CLS_LOSS = 0.0
        cfg.MT.SHARPEN = bool(args.sharpen)
        cfg.MT.HARD_NEG = bool(args.hard_neg)
        cfg.MT.ALPHA = args.alpha
        cfg.MT.START_MT = args.start_mt
        cfg.MT.RAMPUP_STEP = max(args.iters // 6, 50)
        cfg.MT.RAMPDOWN_STEP = max(args.iters // 6, 50)
        cfg.MT.MAX_ITER = args.iters
        # ODKD comparison arm: the reference's retained distillation
        # baseline (generalized_rcnn.py:193-196 — single-view soft CE +
        # naive unmasked hint MSE instead of PSM + MGD). Same unlabeled
        # budget/schedule as the mt arm; only the consistency mechanism
        # differs, reproducing the paper's ablation axis.
        cfg.MT.ODKD = bool(odkd)
        os.makedirs(out_dir, exist_ok=True)
        return cfg

    loader0 = make_source_loader(train_ds, args.batch, canvas, max_gt=64, min_size=size, seed=args.seed)
    batch0 = {k: jnp.asarray(v) for k, v in next(loader0).items()}
    params = init_params(model, batch0, seed=args.seed)
    if args.init_from:
        from mmt_psm_tpu.utils.checkpoint import Checkpointer

        d, n = os.path.split(args.init_from)
        loaded = Checkpointer(d, n).load(n)
        # tree/shape must agree with a fresh init; keep fresh dtypes
        params = jax.tree_util.tree_map(
            lambda a, b: jnp.asarray(b, a.dtype), params, loaded
        )
        print(f"initialized all arms from {args.init_from}", flush=True)

    arms = [("sup", train_ds, False), ("mt", train_ds, True)]
    # opt-in (never part of the default sweep): the ODKD baseline arm and
    # the PSM-only / MGD-only decomposition arms
    if args.arms:
        for extra in ("odkd", "psm", "mgd"):
            if extra in args.arms.split(","):
                arms.append((extra, train_ds, True))
    if args.oracle_slides > 0:
        oracle_ds = synthetic_slide_dataset(
            seed=args.seed, num_slides=args.oracle_slides, slide_size=2 * size, win_size=size, overlap=0.5
        )
        arms.append(("oracle", oracle_ds, False))
    if args.arms:
        wanted = set(args.arms.split(","))
        arms = [a for a in arms if a[0] in wanted]

    results = {}
    t_all = time.time()
    for arm, arm_ds, with_mt in arms:
        out_dir = (
            f"/tmp/mt_lift_{arm}"
            + (f"_s{args.seed}" if args.seed else "")
            + (f"_{args.tag}" if args.tag else "")
        )
        cfg = make_cfg(with_mt, out_dir, odkd=(arm == "odkd"), arm=arm)
        src = make_source_loader(arm_ds, args.batch, canvas, max_gt=64, min_size=size, seed=args.seed)
        unl = (
            make_unlabeled_loader(unlabeled_ds, args.batch, canvas, min_size=size, seed=1 + args.seed)
            if with_mt
            else None
        )
        t0 = time.time()
        trainer = MTTrainer(model, params, cfg, src, unl, output_dir=out_dir)
        state = trainer.train(trainer.resume())
        host = jax.device_get(state)
        print(f"[{arm}] trained {args.iters} iters in {time.time()-t0:.0f}s", flush=True)
        # persist final student/teacher for post-hoc diagnostics
        # (pseudo-label quality probes etc.)
        from mmt_psm_tpu.utils.checkpoint import Checkpointer

        ck = Checkpointer(out_dir, f"{arm}_final")
        ck.save(f"{arm}_final_student", host.params, tag=False)
        if with_mt:
            ck.save(f"{arm}_final_teacher", host.teacher_params, tag=False)

        val_loader = make_test_loader(val_ds, args.batch, canvas, max_gt=64, min_size=size)
        results[f"{arm}_student"] = evaluate(eval_model, host.params, val_loader)
        print(f"[{arm}] student: {results[f'{arm}_student']}", flush=True)
        if with_mt:
            # lambda = 0 never EMAs the teacher (MTtrainer.py:195) — the
            # sup arm's teacher is frozen init, not worth evaluating
            val_loader = make_test_loader(val_ds, args.batch, canvas, max_gt=64, min_size=size)
            results[f"{arm}_teacher"] = evaluate(eval_model, host.teacher_params, val_loader)
            print(f"[{arm}] teacher: {results[f'{arm}_teacher']}", flush=True)

    results["meta"] = {
        "seed": args.seed,
        "size": size,
        "canvas": canvas,
        "iters": args.iters,
        "start_mt": args.start_mt,
        "lambda": args.lam,
        "alpha": args.alpha,
        "fg_hint": args.fg_hint,
        "train_ratio": args.train_ratio,
        "labeled_windows": len(train_ds),
        "unlabeled_patches": len(unlabeled_ds),
        "total_seconds": round(time.time() - t_all, 1),
    }
    print(json.dumps(results, indent=2))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
