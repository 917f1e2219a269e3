"""Post-hoc held-out evaluation of saved lift-experiment checkpoints.

The lift experiment (scripts/mt_lift_experiment.py) persists the final
student/teacher params before evaluating; if a run is cut off mid-eval
this recovers the arm's numbers from the saved trees without retraining.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpts", nargs="+", help="checkpoint name(s), e.g. /tmp/mt_lift_mt/mt_final_student")
    ap.add_argument("--size", type=int, default=256)
    # model canvas (0 = same as --size), mirroring mt_lift_experiment's
    # flagship 1000px-window / 1024-canvas decoupling
    ap.add_argument("--canvas", type=int, default=0)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    from mt_lift_experiment import build_model, evaluate

    from mmt_psm_tpu.data.loader import make_test_loader
    from mmt_psm_tpu.data.pap import synthetic_slide_dataset
    from mmt_psm_tpu.utils.checkpoint import Checkpointer

    from mmt_psm_tpu.utils.env import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    size = args.size
    canvas = args.canvas or size
    eval_model, _ = build_model(canvas, with_hint=False)
    val_ds = synthetic_slide_dataset(
        seed=99, num_slides=8, slide_size=2 * size, win_size=size, overlap=0.0, is_train=False
    )
    results = {}
    for ck_path in args.ckpts:
        out_dir, name = os.path.split(ck_path)
        ck = Checkpointer(out_dir, name)
        params = ck.load(name)
        # periodic trainer saves wrap the tree ({"params":..., "step":...}
        # for t_model_*, full train-state trees for model_*); the *_final_*
        # saves are raw param trees. Accept any of them.
        if isinstance(params, dict) and "params" in params:
            params = params["params"]
        loader = make_test_loader(val_ds, args.batch, canvas, max_gt=64, min_size=size)
        results[name] = evaluate(eval_model, params, loader)
        print(f"{name}: {results[name]}", flush=True)
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
