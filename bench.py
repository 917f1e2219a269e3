"""Benchmark: 1000x1000-patch FLAGSHIP inference throughput per chip.

Measures the graph the pap test path actually runs (reference
configs/pap/e2e_mask_rcnn_R_50_FPN_1x.yaml: USE_RELATION_NMS=True,
USE_RELATION=True — relation-NMS replaces the box post-processor and
the mask relation module refines mask logits, generalized_rcnn.py:86-91).

The BASELINE.md north star is >= 200 patches/sec on a v5e-8, i.e.
25 patches/sec/chip; ``vs_baseline`` is measured against that per-chip
number. Patches are padded to the 1024 canvas (matching the pap
sliding-window pipeline, reference Pap.py:26-31 + SIZE_DIVISIBILITY).

Prints exactly one JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PER_CHIP = 25.0  # patches/sec/chip (200 on v5e-8)


def measure(iters: int = 20, warmup: int = 2, batch_size: int = 16):
    """Dispatch-queue throughput measurement; returns patches/sec.

    Shared by the driver bench (main) and scripts/bench_sensitivity.py's
    methodology sweep (value vs iters/warmup).
    """
    # NOTE: deliberately NOT enabling the persistent compilation cache
    # here: cache serialization of the flagship executable on this
    # 1-core bench host was measured stealing enough host CPU from the
    # dispatch loop to corrupt the timed window (4.4 p/s reading on a
    # cold cache vs 91 steady). The bench always compiles fresh.
    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig

    ycfg = get_cfg()
    ycfg.merge_from_file("configs/pap/mmt_psm_r50_fpn.yaml")
    cfg = ModelConfig.from_cfg(ycfg, train=False)
    assert cfg.with_relation_nms and cfg.with_relation_mask and cfg.image_size == 1024
    model = MaskRCNN(config=cfg)

    b = generate_batch(0, batch_size, image_size=1024, max_instances=64)
    images = jnp.asarray(normalize_image(b["image"]))
    sizes = jnp.asarray(np.full((batch_size, 2), 1000, np.int32))  # true patch size

    init_rngs = {"params": jax.random.PRNGKey(0)}
    init_fn = jax.jit(lambda r, im, sz: model.init(r, im, sz, train=False))
    params = init_fn(init_rngs, images[:1], sizes[:1])

    @jax.jit
    def infer(params, images, sizes):
        d = model.apply(params, images, sizes, train=False)
        # tiny on-device checksum so one host read drains the whole queue
        chk = d.scores.sum() + d.boxes.sum() + d.masks.astype(jnp.float32).sum()
        return (d.boxes, d.scores, d.labels, d.valid, d.masks), chk

    # NOTE: on the remote (axon-tunnel) TPU platform block_until_ready
    # does not actually block; only a host transfer forces execution, and
    # each transfer costs a ~35ms tunnel round trip. Throughput is
    # measured the way a serving pipeline runs: dispatch all batches,
    # then one dependent read drains the serial device queue (single RTT).
    for _ in range(warmup):  # compile + steady-state warmup
        float(infer(params, images, sizes)[1])

    t0 = time.perf_counter()
    chks = [infer(params, images, sizes)[1] for _ in range(iters)]
    float(jnp.stack(chks).sum())
    dt = time.perf_counter() - t0

    return batch_size * iters / dt


def main():
    # throughput-optimal serving batch on v5e (scripts/bench_batch_sweep.py:
    # b8 76.2, b16 90.2, b24 90.0, b32 91.2 p/s — saturates at 16, which
    # amortizes the per-dispatch tunnel overhead without hurting latency
    # beyond one batch period)
    # warmup=4: the sensitivity sweep (scripts/bench_sensitivity.py,
    # RESULTS.md) shows warmup=2 admits a single slow tunnel RTT into
    # the timed window (26.5 outlier at iters=20); at warmup=4 the
    # number is stable ±2.5% across iters 10/20/40
    patches_per_sec = measure(iters=20, warmup=4, batch_size=16)
    print(
        json.dumps(
            {
                "metric": "1000px_patch_inference_throughput_per_chip",
                "value": round(patches_per_sec, 3),
                "unit": "patches/sec/chip",
                "vs_baseline": round(patches_per_sec / BASELINE_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
