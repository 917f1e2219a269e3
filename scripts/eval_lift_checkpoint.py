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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    from mt_lift_experiment import build_model, evaluate

    from mmt_psm_tpu.data.loader import make_test_loader
    from mmt_psm_tpu.data.pap import synthetic_slide_dataset
    from mmt_psm_tpu.utils.checkpoint import Checkpointer

    size = args.size
    eval_model, _ = build_model(size, with_hint=False)
    val_ds = synthetic_slide_dataset(
        seed=99, num_slides=8, slide_size=2 * size, win_size=size, overlap=0.0, is_train=False
    )
    results = {}
    for ck_path in args.ckpts:
        out_dir, name = os.path.split(ck_path)
        ck = Checkpointer(out_dir, name)
        params = ck.load(name)
        loader = make_test_loader(val_ds, args.batch, size, max_gt=64, min_size=size)
        results[name] = evaluate(eval_model, params, loader)
        print(f"{name}: {results[name]}", flush=True)
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
