"""Measured END-TO-END eval throughput at the 1000px flagship (VERDICT
r3 item 1 of "what's missing"): a steady-state ``run_inference`` pass —
real data pipeline (windowing, resize, canvas pad), jitted batched
device inference, pipelined host paste + Papeval scoring with the C++
kernels — over >=200 synthetic 1000px windows, reporting the loop's own
``images_per_sec`` (engine/inference.py). This is the measurement the
round-3 "36 img/s serial host ceiling" stage-microbench sum projected;
the reference's equivalent is the timed eval loop at
/root/reference/maskrcnn_benchmark/engine/inference.py:93-104.

A warm-up pass over 2 batches compiles the executables first, so the
timed pass is steady-state (first TPU compile is ~30 s and would
otherwise poison a ~2-4 min measurement).

Usage: python scripts/eval_throughput.py [--ckpt /tmp/mt_lift_psm/psm_final_teacher]
(--ckpt uses trained lift-experiment params so detection counts are in
the shipping regime; without it, random-init near-uniform scores keep
~max detections per image alive — the conservative upper bound on host
work.)
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default="")
    ap.add_argument("--torch-ckpt", type=str, default="")
    ap.add_argument("--images", type=int, default=208)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workers", type=int, default=0, help="eval_workers (0=serial host)")
    ap.add_argument(
        "--prefetch-depth", type=int, default=-1,
        help="batches assembled ahead in the Prefetcher thread "
        "(0=synchronous loader, -1=auto: on with a spare core)",
    )
    # ship raw RGB u8 canvases and normalize on device (1/4 the
    # host->device bytes — the measured bottleneck on the axon tunnel:
    # 14.4 s per 200 MB f32 b16 batch)
    ap.add_argument("--raw-u8", action="store_true")
    # materialize + device_put every batch BEFORE the timed pass: the
    # timed loop then measures device compute + host paste/score only
    # (loader GT-crop and image upload excluded) — the engine-bound
    # number the per-stage microbench ceiling projects
    ap.add_argument("--prestage", action="store_true")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    import jax

    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.loader import make_test_loader
    from mmt_psm_tpu.data.pap import synthetic_slide_dataset
    from mmt_psm_tpu.engine.inference import run_inference
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig

    ycfg = get_cfg()
    ycfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs/pap/mmt_psm_r50_fpn.yaml")
    )
    cfg = ModelConfig.from_cfg(ycfg, train=False)
    assert cfg.image_size == 1024 and cfg.with_relation_nms and cfg.with_relation_mask
    model = MaskRCNN(config=cfg)

    # 2x2 grid of 1000px windows per 2000px slide; radius_range shrunk so
    # window-level cell sizes stay in the realistic 120-320px band.
    # Generation costs ~50 min on a contended 1-core host — cache it.
    import pickle

    n_slides = (args.images + 3) // 4
    cache = f"/tmp/eval_tput_ds_{n_slides}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            ds = pickle.load(f)
    else:
        ds = synthetic_slide_dataset(
            seed=11,
            num_slides=n_slides,
            slide_size=2000,
            win_size=1000,
            overlap=0.0,
            is_train=False,
            num_cells=(24, 48),
            radius_range=(0.03, 0.08),
        )
        with open(cache, "wb") as f:
            pickle.dump(ds, f, protocol=4)
    print(f"dataset: {len(ds)} windows from {n_slides} slides", flush=True)

    def loader():
        it = make_test_loader(
            ds, args.batch, 1024, max_gt=64, min_size=1000, max_size=1333,
            raw_u8=args.raw_u8,
        )
        if not args.prestage:
            return it
        staged = []
        for b in it:
            b = dict(b)
            b["image"] = jax.device_put(b["image"])
            b["image_size"] = jax.device_put(b["image_size"])
            staged.append(b)
        return iter(staged)

    if args.torch_ckpt:
        # a state_dict of the torch reference (e.g. tests/ref_train.py's
        # cached CPU-trained model) imported through the production
        # converter — the only full-flagship-graph trained weights
        # available in this env (lift checkpoints ship without the
        # relation modules)
        import jax.numpy as jnp
        import torch

        from mmt_psm_tpu.utils.torch_import import apply_to_params, convert_state_dict

        first = next(iter(loader()))
        variables = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.asarray(first["image"][:1]),
                jnp.asarray(first["image_size"][:1]),
                train=False,
            )
        )()
        sd = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
        flat = convert_state_dict({k: v.detach().numpy() for k, v in sd.items()})
        p, report = apply_to_params(variables["params"], flat)
        assert not report["mismatched"], report["mismatched"][:5]
        params = {"params": p}
        src = args.torch_ckpt
    elif args.ckpt:
        out_dir, name = os.path.split(args.ckpt)
        from mmt_psm_tpu.utils.checkpoint import Checkpointer

        # run_inference takes the full variables dict (engine/inference.py
        # _cached_infer -> model.apply(p, ...))
        params = {"params": Checkpointer(out_dir, name).load(name)}
        src = args.ckpt
    else:
        first = next(iter(loader()))
        import jax.numpy as jnp

        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.asarray(first["image"][:1]),
            jnp.asarray(first["image_size"][:1]),
            train=False,
        )
        src = "random-init"

    # warm-up: compile + first-dispatch costs out of the timed pass
    warm = itertools.islice(loader(), 2)
    run_inference(model, params, warm, eval_workers=0)
    print("warmed up; timing steady-state pass", flush=True)

    t0 = time.perf_counter()
    stats, timing = run_inference(
        model, params, loader(), eval_workers=args.workers,
        prefetch_depth=args.prefetch_depth,
    )
    wall = time.perf_counter() - t0
    out = {
        "params": src,
        "images": timing["images"],
        "images_per_sec": round(timing["images_per_sec"], 2),
        "seconds": round(timing["seconds"], 1),
        "wall_seconds": round(wall, 1),
        "batch": args.batch,
        "workers": args.workers,
        "prefetch_depth": args.prefetch_depth,
        "raw_u8": args.raw_u8,
        "prestage": args.prestage,
        "stage_seconds": timing.get("stage_seconds", {}),
        "stats": {
            (k if isinstance(v, (int, float)) else f"{k}_{kk}"): round(float(x), 4)
            for k, v in stats.items()
            for kk, x in (v.items() if isinstance(v, dict) else [(None, v)])
            if isinstance(x, (int, float))
        },
    }
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
