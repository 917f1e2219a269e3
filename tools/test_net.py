"""Evaluation sweep over checkpoints.

Parity with the reference test_net (reference: tools/test_net.py:24-303):
evaluates every ``model_*``/``t_model_*`` checkpoint in a directory on
the val/test split, aggregates AJI / mAP / AP50/75/85 per class, and
writes ``result.json`` + ``best_result.json``.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    from mmt_psm_tpu.utils.env import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser(description="TPU eval sweep")
    parser.add_argument("--config-file", default="", type=str)
    parser.add_argument("--ckpt-dir", required=True, type=str)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--output-dir", default="", type=str)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.loader import make_test_loader
    from mmt_psm_tpu.data.pap import synthetic_slide_dataset
    from mmt_psm_tpu.engine.inference import run_inference
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig
    from mmt_psm_tpu.utils.checkpoint import Checkpointer

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    mcfg = ModelConfig.from_cfg(cfg, train=False)
    model = MaskRCNN(config=mcfg)
    canvas = mcfg.image_size

    if args.synthetic:
        win = min(canvas, 256)
        ds = synthetic_slide_dataset(seed=42, num_slides=2, slide_size=2 * win, win_size=win, overlap=0.0, is_train=False)
        min_size = win
    else:
        # resolve the eval split through the catalog; MODE_IN_TEST picks
        # val vs test (reference tools/test_net.py:257, defaults.py:42)
        from mmt_psm_tpu.data.catalog import DatasetCatalog, build_datasets

        names = cfg.DATASETS.VAL if cfg.DATASETS.MODE_IN_TEST == "val" else cfg.DATASETS.TEST
        if not names:
            raise SystemExit(
                f"cfg.DATASETS.{cfg.DATASETS.MODE_IN_TEST.upper()} is empty — "
                f"name catalog datasets (known: {sorted(DatasetCatalog.DATASETS)}) "
                "or pass --synthetic."
            )
        ds = build_datasets(names)
        min_size = min(cfg.INPUT.MIN_SIZE_TEST, canvas)

    # shard eval batches over the data mesh (replaces the reference's
    # per-rank split + tmpdir gather, engine/inference.py:44-67)
    from mmt_psm_tpu.engine.trainer import mesh_size_for
    from mmt_psm_tpu.parallel import make_mesh

    mesh_n = mesh_size_for(cfg, cfg.TEST.IMS_PER_BATCH)
    mesh = make_mesh(mesh_n) if mesh_n > 1 else None

    ckpt = Checkpointer(args.ckpt_dir)
    names = sorted(
        n for n in os.listdir(args.ckpt_dir)
        if (n.startswith("model_") or n.startswith("t_model_")) and os.path.isdir(os.path.join(args.ckpt_dir, n))
    )
    if not names:
        raise SystemExit(f"no checkpoints in {args.ckpt_dir}")

    out_dir = args.output_dir or args.ckpt_dir
    os.makedirs(out_dir, exist_ok=True)
    results = {}
    for name in names:
        restored = ckpt.load(name)
        params = {"params": restored["params"]}
        loader = make_test_loader(
            ds, cfg.TEST.IMS_PER_BATCH, canvas, max_gt=cfg.TPU.MAX_GT,
            min_size=min_size, max_size=canvas,
        )
        stats, timing = run_inference(
            model, params, loader, mesh=mesh,
            eval_workers=int(getattr(cfg.TEST, "EVAL_WORKERS", 0)),
            visual_num=cfg.TEST.VISUAL_NUM,
            visual_dir=os.path.join(out_dir, f"vis_{name}") if cfg.TEST.VISUAL_NUM else None,
            mat_dir=os.path.join(out_dir, f"mat_{name}") if cfg.TEST.GEN else None,
        )
        if cfg.TEST.EXPECTED_RESULTS:
            from mmt_psm_tpu.engine.inference import check_expected_results

            check_expected_results(
                stats, cfg.TEST.EXPECTED_RESULTS, cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL
            )
        aji = stats["AJI"]
        results[name] = {
            "AJI": {str(k): v for k, v in aji.items()},
            "AJI_mean": float(np.mean(list(aji.values()))) if aji else 0.0,
            "mAP": stats["mAP"].get("all", -1),
            "AP50": stats["AP50"].get("all", -1),
            "AP75": stats["AP75"].get("all", -1),
            "AP85": stats["AP85"].get("all", -1),
            "F1": {str(k): v for k, v in stats["F1"].items()},
            "images_per_sec": timing["images_per_sec"],
        }
        print(name, json.dumps(results[name]))

    with open(os.path.join(out_dir, "result.json"), "w") as f:
        json.dump(results, f, indent=2)
    best = max(results, key=lambda n: results[n]["AJI_mean"])
    with open(os.path.join(out_dir, "best_result.json"), "w") as f:
        json.dump({best: results[best]}, f, indent=2)
    plot_metric_curves(results, out_dir)
    print("best:", best, results[best]["AJI_mean"])


def plot_metric_curves(results: dict, out_dir: str):
    """AJI/mAP/AP curves over the checkpoint sweep, student vs teacher
    series (reference tools/test_net.py:151-233)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    series = {
        "student": sorted(n for n in results if not n.startswith("t_model")),
        "teacher": sorted(n for n in results if n.startswith("t_model")),
    }
    metrics = ["AJI_mean", "mAP", "AP50", "AP75", "AP85"]
    fig, axes = plt.subplots(1, len(metrics), figsize=(4 * len(metrics), 3.5))
    for ax, metric in zip(axes, metrics):
        for label, names in series.items():
            if not names:
                continue
            ax.plot(range(len(names)), [results[n][metric] for n in names], marker="o", label=label)
        ax.set_title(metric)
        ax.set_xlabel("checkpoint")
        ax.grid(True, alpha=0.3)
    axes[0].legend()
    fig.tight_layout()
    path = os.path.join(out_dir, "metrics.png")
    fig.savefig(path, dpi=100)
    plt.close(fig)
    print("metric curves:", path)


if __name__ == "__main__":
    main()
