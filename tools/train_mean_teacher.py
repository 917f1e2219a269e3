"""Mean-teacher training entry point.

CLI parity with the reference (reference:
tools/train_mean_teacher.py:104-204): a YAML config plus yacs-style
``KEY VALUE`` overrides; builds student (+EMA teacher), data loaders,
and runs the MTTrainer. Without real pap data on disk, pass
``--synthetic`` for a self-contained run on generated slides.

Usage:
  python tools/train_mean_teacher.py --config-file configs/pap/e2e_mask_rcnn_R_50_FPN_1x.yaml \
      --synthetic MT.LAMBDA 5. SOLVER.MAX_ITER 200 [...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    from mmt_psm_tpu.utils.env import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser(description="TPU mean-teacher training")
    parser.add_argument("--config-file", default="", type=str)
    parser.add_argument("--synthetic", action="store_true", help="train on synthetic slides")
    parser.add_argument("--weights", default="", type=str, help="torch .pth init (transfer mode)")
    parser.add_argument("--resume", action="store_true", help="resume from last_checkpoint in output dir")
    parser.add_argument("--skip-test", action="store_true", help="skip the post-train val sweep")
    parser.add_argument("--output-dir", default="runs/mt", type=str)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.loader import make_source_loader, make_unlabeled_loader
    from mmt_psm_tpu.data.pap import PapUnlabeledDataset, synthetic_slide_dataset
    from mmt_psm_tpu.engine.trainer import MTTrainer
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig
    from mmt_psm_tpu.train.supervised import batch_to_gt

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    mcfg = ModelConfig.from_cfg(cfg)  # flagship graph incl. relation heads + hint adaptor
    model = MaskRCNN(config=mcfg)

    canvas = mcfg.image_size
    if args.synthetic:
        win = min(canvas, 256)
        source_ds = synthetic_slide_dataset(seed=0, num_slides=4, slide_size=2 * win, win_size=win, overlap=0.5)
        rng = np.random.default_rng(1)
        patches = [
            synthetic_slide_dataset(seed=10 + i, num_slides=1, slide_size=win, win_size=win).slides[0]
            for i in range(8)
        ]
        unlabeled_ds = PapUnlabeledDataset(patches)
        min_size = win
    else:
        # real-data path: resolve cfg.DATASETS.* through the catalog
        # (reference data/build.py:19-68 + config/paths_catalog.py:113-174)
        from mmt_psm_tpu.data.catalog import DatasetCatalog, build_datasets

        if not cfg.DATASETS.TRAIN:
            raise SystemExit(
                "cfg.DATASETS.TRAIN is empty — name catalog datasets "
                f"(known: {sorted(DatasetCatalog.DATASETS)}, or coco_* dirs "
                f"under {DatasetCatalog.DATA_DIR}) or pass --synthetic."
            )
        source_ds = build_datasets(cfg.DATASETS.TRAIN)
        unlabeled_ds = build_datasets(cfg.DATASETS.GEN) if cfg.DATASETS.NO_LABEL else None
        # resized images must fit the static canvas (max_size caps the
        # long side; pad_to_canvas asserts h,w <= canvas)
        min_size = min(cfg.INPUT.MIN_SIZE_TRAIN, canvas)

    src_loader = make_source_loader(
        source_ds, cfg.SOLVER.IMS_PER_BATCH, canvas, max_gt=cfg.TPU.MAX_GT,
        min_size=min_size, max_size=canvas,
    )
    unl_loader = (
        make_unlabeled_loader(
            unlabeled_ds, cfg.SOLVER.IMS_PER_BATCH, canvas,
            aug_k=cfg.MT.AUG_K, aug_s=cfg.MT.AUG_S, min_size=min_size, max_size=canvas,
        )
        if cfg.DATASETS.NO_LABEL and unlabeled_ds is not None
        else None
    )

    first = next(src_loader)
    import jax.numpy as jnp

    batch0 = {k: jnp.asarray(v) for k, v in first.items()}
    # jit the init: eager init dispatches tens of thousands of tiny ops,
    # which is pathological over a remote-TPU tunnel
    init_fn = jax.jit(lambda rngs, img, sz, gt: model.init(rngs, img, sz, gt, method=model.init_all))
    params = init_fn(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch0["image"], batch0["image_size"], batch_to_gt(batch0),
    )["params"]

    if args.weights:
        # resolves catalog:// names, cached URLs, Caffe2 .pkl, torch .pth
        # (reference DetectronCheckpointer._load_file, checkpoint.py:178-201)
        from mmt_psm_tpu.utils.c2_loading import load_checkpoint_file

        arch = "R-101" if "101" in cfg.MODEL.BACKBONE.CONV_BODY else "R-50"
        params, report = load_checkpoint_file(args.weights, params, transfer=True, arch=arch)
        print(f"loaded {len(report['loaded'])} tensors from {args.weights}; "
              f"missing {len(report['missing'])}, mismatched {len(report['mismatched'])}")

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "config.yaml"), "w") as f:
        f.write(cfg.dump())

    trainer = MTTrainer(model, params, cfg, src_loader, unl_loader, output_dir=args.output_dir)
    # reference Checkpointer semantics: an existing last_checkpoint in the
    # run dir always wins over the init weights (utils/checkpoint.py:82-99);
    # --resume is kept as an explicit alias
    start_iter = trainer.resume() if (args.resume or trainer.ckpt_s.has_checkpoint()) else 0
    trainer.train(start_iter)

    if not args.skip_test:
        # post-train val sweep (reference tools/train_mean_teacher.py:69-101)
        import dataclasses
        import json

        from mmt_psm_tpu.data.loader import make_test_loader
        from mmt_psm_tpu.engine.inference import run_inference

        eval_model = MaskRCNN(config=dataclasses.replace(mcfg, with_hint_adaptor=False))
        if args.synthetic:
            val_ds = synthetic_slide_dataset(
                seed=42, num_slides=2, slide_size=2 * win, win_size=win, overlap=0.0, is_train=False
            )
        else:
            from mmt_psm_tpu.data.catalog import build_datasets as _build

            val_ds = _build(cfg.DATASETS.VAL) if cfg.DATASETS.VAL else None
        if val_ds is not None:
            loader = make_test_loader(
                val_ds, cfg.TEST.IMS_PER_BATCH, canvas, max_gt=cfg.TPU.MAX_GT,
                min_size=min_size, max_size=canvas,
            )
            final_params = {"params": jax.device_get(trainer.state.params)}
            stats, timing = run_inference(
                eval_model, final_params, loader,
                eval_workers=int(getattr(cfg.TEST, "EVAL_WORKERS", 0)),
            )
            aji = {str(k): v for k, v in stats["AJI"].items()}
            summary = {
                "AJI": aji,
                "AJI_mean": float(np.mean(list(stats["AJI"].values()))) if stats["AJI"] else 0.0,
                "mAP": stats["mAP"].get("all", -1),
                "AP50": stats["AP50"].get("all", -1),
                "images_per_sec": timing["images_per_sec"],
            }
            with open(os.path.join(args.output_dir, "final_eval.json"), "w") as f:
                json.dump(summary, f, indent=2)
            print("final_eval:", json.dumps(summary))


if __name__ == "__main__":
    main()
