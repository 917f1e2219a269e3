"""MFU / speed-of-light accounting for the flagship inference graph.

Answers two questions the stage profiler (profile_inference.py) can't:

1. **How many FLOPs does the flagship graph actually execute**, per the
   compiled executable's own cost model (`compile().cost_analysis()`),
   and what MFU does the measured throughput imply against the chip's
   bf16 peak?
2. **Where does wall time go between device compute and dispatch** on
   the axon-tunnel platform: times the served graph at several dispatch
   depths (sync every iter vs draining a queue of N) to separate
   per-dispatch overhead from true device time.

Run on an otherwise-idle chip. Dev tool — not part of the test suite.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# v5e bf16 peak (Google-published: 197 TFLOP/s bf16 per chip)
PEAK_BF16 = 197e12


def main():
    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig

    batch_size = int(os.environ.get("MFU_BATCH", "16"))
    ycfg = get_cfg()
    ycfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..", "configs/pap/mmt_psm_r50_fpn.yaml"))
    cfg = ModelConfig.from_cfg(ycfg, train=False)
    assert cfg.with_relation_nms and cfg.with_relation_mask
    model = MaskRCNN(config=cfg)

    b = generate_batch(0, batch_size, image_size=1024, max_instances=64)
    images = jnp.asarray(normalize_image(b["image"]))
    sizes = jnp.asarray(np.full((batch_size, 2), 1000, np.int32))
    params = jax.jit(lambda r, im, sz: model.init(r, im, sz, train=False))(
        {"params": jax.random.PRNGKey(0)}, images[:1], sizes[:1]
    )

    def infer(params, images, sizes):
        d = model.apply(params, images, sizes, train=False)
        chk = d.scores.sum() + d.boxes.sum() + d.masks.astype(jnp.float32).sum()
        return (d.boxes, d.scores, d.labels, d.valid, d.masks), chk

    # --- compiled cost analysis -------------------------------------
    # one compile, reused for both the cost model and the timing sweep
    # (compiling twice costs ~4 min on the flagship graph)
    compiled = jax.jit(infer).lower(params, images, sizes).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))
    hbm_bytes = float(ca.get("bytes accessed", float("nan")))
    print(f"cost_analysis: flops={flops:.3e}  bytes_accessed={hbm_bytes:.3e}", flush=True)
    print(f"per-patch: {flops/batch_size/1e9:.1f} GFLOP, {hbm_bytes/batch_size/1e6:.0f} MB touched")

    # --- dispatch-depth sweep ----------------------------------------
    fn = compiled  # Compiled.__call__ skips retracing/dispatch caching
    for _ in range(2):
        float(fn(params, images, sizes)[1])

    print(f"\nbatch {batch_size}; dispatch-depth sweep (total 40 batches each):")
    results = {}
    for depth in (1, 2, 5, 10, 20, 40):
        iters = 40
        t0 = time.perf_counter()
        done = 0
        while done < iters:
            n = min(depth, iters - done)
            chks = [fn(params, images, sizes)[1] for _ in range(n)]
            float(jnp.stack(chks).sum())
            done += n
        dt = time.perf_counter() - t0
        pps = batch_size * iters / dt
        results[depth] = pps
        print(f"  depth {depth:3d}: {dt/iters*1000:7.2f} ms/batch  {pps:6.1f} patches/s")

    best = max(results.values())
    device_ms = batch_size / best * 1000
    mfu = flops / batch_size * best / PEAK_BF16
    print(f"\nbest throughput {best:.1f} p/s -> {device_ms:.1f} ms/batch-equiv")
    print(f"MFU vs v5e bf16 peak (197 TF/s): {100*mfu:.1f}%")
    print(json.dumps({"flops_per_patch": flops / batch_size, "best_pps": best, "mfu": mfu}))


if __name__ == "__main__":
    main()
