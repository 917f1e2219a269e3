"""Batch-size sweep of the flagship inference bench (dev tool).

bench.py measures batch 8; this sweeps the batch dimension to find the
throughput-optimal serving batch on the attached chip (fixed per-dispatch
overheads amortize with batch; VMEM/HBM limits cap it).
"""

import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run(batch_size: int) -> float:
    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig

    ycfg = get_cfg()
    ycfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..", "configs/pap/mmt_psm_r50_fpn.yaml"))
    cfg = ModelConfig.from_cfg(ycfg, train=False)
    model = MaskRCNN(config=cfg)

    b = generate_batch(0, batch_size, image_size=1024, max_instances=64)
    images = jnp.asarray(normalize_image(b["image"]))
    sizes = jnp.asarray(np.full((batch_size, 2), 1000, np.int32))
    params = jax.jit(lambda r, im, sz: model.init(r, im, sz, train=False))(
        {"params": jax.random.PRNGKey(0)}, images[:1], sizes[:1]
    )

    @jax.jit
    def infer(params, images, sizes):
        d = model.apply(params, images, sizes, train=False)
        chk = d.scores.sum() + d.boxes.sum() + d.masks.astype(jnp.float32).sum()
        return chk

    for _ in range(2):
        float(infer(params, images, sizes))
    iters = max(int(160 / batch_size), 6)
    t0 = time.perf_counter()
    chks = [infer(params, images, sizes) for _ in range(iters)]
    float(jnp.stack(chks).sum())
    dt = time.perf_counter() - t0
    pps = batch_size * iters / dt
    print(f"batch {batch_size:3d}: {pps:7.2f} patches/s ({dt/iters*1000:7.1f} ms/batch)", flush=True)
    return pps


if __name__ == "__main__":
    batches = [int(x) for x in (sys.argv[1:] or ["8", "12", "16", "24"])]
    for bs in batches:
        try:
            run(bs)
        except Exception as e:  # OOM at large batch is expected
            print(f"batch {bs}: FAILED {type(e).__name__}: {str(e)[:200]}")
