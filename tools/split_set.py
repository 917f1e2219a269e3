"""Dataset fold splitting (reference: tools/split_set.py).

Splits a directory of slide images into K folds (train/val/test
assignments), writing fold lists as JSON. Deterministic per seed.

Usage:
  python tools/split_set.py --data-dir datasets/pap/images --folds 3 --out folds.json
"""

import argparse
import json
import os

import numpy as np


def split_folds(names, num_folds: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(names))
    folds = [[] for _ in range(num_folds)]
    for i, idx in enumerate(order):
        folds[i % num_folds].append(names[int(idx)])
    return folds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--folds", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="folds.json")
    args = ap.parse_args()

    names = sorted(
        f for f in os.listdir(args.data_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".tif", ".tiff", ".svs"))
    )
    folds = split_folds(names, args.folds, args.seed)
    payload = {f"fold_{i+1}": fold for i, fold in enumerate(folds)}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"{len(names)} slides -> {args.folds} folds -> {args.out}")


if __name__ == "__main__":
    main()
