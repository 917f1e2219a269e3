"""Benchmark: 1000x1000-patch FLAGSHIP inference throughput per chip.

Measures the graph the pap test path actually runs (reference
configs/pap/e2e_mask_rcnn_R_50_FPN_1x.yaml: USE_RELATION_NMS=True,
USE_RELATION=True — relation-NMS replaces the box post-processor and
the mask relation module refines mask logits, generalized_rcnn.py:86-91).

The BASELINE.md north star is >= 200 patches/sec on a v5e-8, i.e.
25 patches/sec/chip; ``vs_baseline`` is measured against that per-chip
number. Patches are padded to the 1024 canvas (matching the pap
sliding-window pipeline, reference Pap.py:26-31 + SIZE_DIVISIBILITY).

Prints exactly one JSON line on stdout:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Robustness (round 5 — the round-4 driver bench timed out, rc=124,
because ~8 of the 9 minutes were a deliberately fresh flagship compile
with no liveness check in front; the reference always emits its timing,
engine/inference.py:93-104):

* ``--probe``: a tiny jitted computation proves the device + tunnel are
  alive. main() runs it as a SUBPROCESS with a hard timeout and bounded
  retries before committing to the expensive compile, so a dead/busy
  chip fails in seconds, not after a driver timeout.
* ``--warm-cache``: compiles the flagship programs with the persistent
  compilation cache in WRITE mode and exits. main() runs this as a
  subprocess first; the timed parent then enables the cache READ-ONLY
  (write threshold set unreachably high), so compile collapses to a
  disk deserialize (~30-60 s) and cache *serialization* — measured on
  this 1-core host to steal enough CPU from the dispatch loop to read
  4.4 p/s instead of 91 — can never pollute the timed window. Cold
  cache: the warmer pays the one full compile; every later run (incl.
  the driver's end-of-round run) lands the JSON line in ~2-3 min.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_PER_CHIP = 25.0  # patches/sec/chip (200 on v5e-8)
CACHE_DIR = os.environ.get(
    "MMT_PSM_BENCH_CACHE", os.path.expanduser("~/.cache/mmt_psm_bench_cache")
)
PROBE_TIMEOUT_S = 120
PROBE_RETRIES = 3
WARM_TIMEOUT_S = 1500  # full fresh flagship compile is ~8-9 min here


def _enable_cache(read_only: bool) -> None:
    import jax

    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    # The min-compile-time threshold gates cache WRITES only; reads are
    # unconditional. An unreachable threshold == read-only cache.
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 1e18 if read_only else 0.0
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def probe() -> None:
    """Cheap device-liveness check: jit + execute + read back one scalar."""
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    x = jnp.arange(1024, dtype=jnp.float32)
    val = float(jax.jit(lambda v: (v * v).sum())(x))
    assert val == 357389824.0, val
    print(f"probe ok: {dev.platform} {dev.device_kind}", file=sys.stderr)


def measure(iters: int = 20, warmup: int = 2, batch_size: int = 16):
    """Dispatch-queue throughput measurement; returns patches/sec.

    Shared by the driver bench (main) and scripts/bench_sensitivity.py's
    methodology sweep (value vs iters/warmup).
    """
    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmt_psm_tpu.models import MaskRCNN, ModelConfig

    ycfg = get_cfg()
    ycfg.merge_from_file("configs/pap/mmt_psm_r50_fpn.yaml")
    # ad-hoc kernel-knob A/B without editing the yaml (e.g. pooler align)
    env_align = os.environ.get("MMT_PSM_POOL_ALIGN")
    if env_align:
        ycfg.TPU.POOL_ALIGN = int(env_align)
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


def warm_cache() -> None:
    """Compile the flagship programs into the persistent cache and exit."""
    _enable_cache(read_only=False)
    t0 = time.perf_counter()
    pps = measure(iters=1, warmup=1, batch_size=16)
    print(
        f"warm-cache done in {time.perf_counter() - t0:.1f}s"
        f" (throwaway reading {pps:.1f} p/s)",
        file=sys.stderr,
    )


def _run_self(mode: str, timeout: float) -> bool:
    """Run this script in a subprocess mode; diagnostics go to stderr."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            timeout=timeout,
            stdout=sys.stderr,
            stderr=sys.stderr,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        print(f"{mode} subprocess timed out after {timeout}s", file=sys.stderr)
        return False


def main():
    t_start = time.perf_counter()

    def stamp(msg):
        print(f"[bench +{time.perf_counter() - t_start:6.1f}s] {msg}", file=sys.stderr)

    skip_prep = os.environ.get("MMT_PSM_BENCH_SKIP_PREP", "") == "1"
    # 1) Device liveness, fail-fast: a dead chip/tunnel should cost
    #    seconds (clear rc=1 + stderr), never a driver-side timeout.
    for attempt in range(1, PROBE_RETRIES + 1):
        if skip_prep or _run_self("--probe", PROBE_TIMEOUT_S):
            stamp(f"probe ok (attempt {attempt})")
            break
        stamp(f"probe attempt {attempt}/{PROBE_RETRIES} failed")
        if attempt == PROBE_RETRIES:
            print("device probe failed; refusing the expensive compile", file=sys.stderr)
            sys.exit(1)
        time.sleep(5 * attempt)

    # 2) Warm the compilation cache out-of-process (cache writes and
    #    their CPU cost happen there, not in the timed process). A warm
    #    cache makes this a ~1 min no-op. Tolerate failure: the parent
    #    then simply compiles fresh like the pre-round-5 bench did.
    if not skip_prep and not _run_self("--warm-cache", WARM_TIMEOUT_S):
        print("cache warm failed; timed process will compile fresh", file=sys.stderr)
    stamp("cache warm done")

    # 3) Timed measurement with a read-only cache.
    _enable_cache(read_only=True)
    # throughput-optimal serving batch on v5e (scripts/bench_batch_sweep.py:
    # b8 76.2, b16 90.2, b24 90.0, b32 91.2 p/s — saturates at 16, which
    # amortizes the per-dispatch tunnel overhead without hurting latency
    # beyond one batch period)
    # warmup=4: the sensitivity sweep (scripts/bench_sensitivity.py,
    # RESULTS.md) shows warmup=2 admits a single slow tunnel RTT into
    # the timed window (26.5 outlier at iters=20); at warmup=4 the
    # number is stable ±2.5% across iters 10/20/40
    patches_per_sec = measure(iters=20, warmup=4, batch_size=16)
    stamp("measurement done")
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
    if "--probe" in sys.argv:
        probe()
    elif "--warm-cache" in sys.argv:
        warm_cache()
    else:
        main()
