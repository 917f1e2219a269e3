"""Micro-benchmark of the Pallas windowed pooler on REAL proposal sets.

Times ops/roi_align_pallas.multilevel_roi_align_pallas in isolation on
the flagship's actual RoI distribution (captured by
`scripts/window_stats.py --save` -> /tmp/flagship_rois.npz), against
random bf16 FPN maps at the 1024 canvas. Separates the pooler's wall
from the fused box-head stage so kernel changes (window size, start
alignment, RoIs/step batching) can be A/B'd in ~a minute instead of
through the full bench.

Usage:
    python scripts/window_stats.py --save   # once, ~5 min
    python scripts/pooler_bench.py [--mask] [--window 48] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mask", action="store_true", help="mask-head RoIs (180/img) instead of box-head (1000/img)")
    ap.add_argument("--window", type=int, default=48)
    ap.add_argument("--align", type=int, default=8)
    ap.add_argument("--resolution", type=int, default=0, help="0 = 7 for box / 14 for mask")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rois", type=str, default="/tmp/flagship_rois.npz")
    ap.add_argument("--limit", type=int, default=0, help="cap RoIs per image (grid-step scaling diagnostic)")
    ap.add_argument("--scan", type=int, default=1, help="pooler invocations per dispatch (in-graph loop)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmt_psm_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

    d = np.load(args.rois)
    boxes = d["det_boxes" if args.mask else "prop_boxes"]
    if args.limit:
        boxes = boxes[:, : args.limit]
    res = args.resolution or (14 if args.mask else 7)
    bsz, n = boxes.shape[:2]

    size, c = 1024, 256
    scales = (0.25, 0.125, 0.0625, 0.03125)
    rng = np.random.default_rng(0)
    feats = tuple(
        jnp.asarray(rng.normal(size=(bsz, size // s, size // s, c)).astype(np.float32), jnp.bfloat16)
        for s in (4, 8, 16, 32)
    )
    jboxes = jnp.asarray(boxes)

    if args.scan > 1:
        # K invocations inside ONE dispatch (boxes perturbed per step so
        # XLA can't CSE them): separates device kernel time from any
        # per-dispatch tunnel overhead
        K = args.scan

        def body(i, acc):
            b2 = jboxes + (i.astype(jnp.float32) * 1e-3)
            return acc + multilevel_roi_align_pallas(
                feats, b2, scales, res, 2, args.window, args.align
            ).astype(jnp.float32).sum()

        fn = jax.jit(lambda f, b: jax.lax.fori_loop(0, K, body, jnp.float32(0.0)))
    else:
        fn = jax.jit(
            lambda f, b: multilevel_roi_align_pallas(f, b, scales, res, 2, args.window, args.align).sum()
        )
    # warmup/compile
    float(fn(feats, jboxes))
    float(fn(feats, jboxes))
    t0 = time.perf_counter()
    vals = [fn(feats, jboxes) for _ in range(args.iters)]
    float(jnp.stack(vals).sum())  # drain the dispatch queue in one read
    dt = (time.perf_counter() - t0) / (args.iters * args.scan)
    print(
        f"{'mask' if args.mask else 'box'}-head pooler window={args.window} res={res}: "
        f"{dt*1e3:7.2f} ms/batch  ({dt/bsz*1e6:6.0f} us/patch, {bsz}x{n} RoIs, "
        f"align={args.align} scan={args.scan})"
    )


if __name__ == "__main__":
    main()
