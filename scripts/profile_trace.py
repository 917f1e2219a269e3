"""Capture a profiler trace of the flagship serving graph and print
per-HLO-op time aggregates (dev tool).

The stage-wall profiler (scripts/profile_inference.py) times stages by
host sync, which both hides intra-stage structure and pays the axon
tunnel RTT per reading. This tool instead captures an XLA device trace
of a few queue-drained dispatches and aggregates device time by HLO op
category and by individual op, via tensorboard_plugin_profile's xplane
converter — the ground truth for where the serving milliseconds go.

Usage: python scripts/profile_trace.py [--batch 16] [--iters 4]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def capture(batch: int, iters: int, outdir: str):
    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig

    ycfg = get_cfg()
    ycfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs/pap/mmt_psm_r50_fpn.yaml")
    )
    cfg = ModelConfig.from_cfg(ycfg, train=False)
    assert cfg.with_relation_nms and cfg.with_relation_mask
    model = MaskRCNN(config=cfg)
    b = generate_batch(0, batch, image_size=1024, max_instances=64)
    images = jnp.asarray(normalize_image(b["image"]))
    sizes = jnp.asarray(np.full((batch, 2), 1000, np.int32))
    params = jax.jit(lambda r, im, sz: model.init(r, im, sz, train=False))(
        {"params": jax.random.PRNGKey(0)}, images[:1], sizes[:1]
    )

    @jax.jit
    def infer(params, images, sizes):
        d = model.apply(params, images, sizes, train=False)
        return d.scores

    # compile + warm
    float(infer(params, images, sizes).sum())
    with jax.profiler.trace(outdir):
        outs = [infer(params, images, sizes) for _ in range(iters)]
        float(jnp.stack(outs).sum())


def capture_mt(batch: int, iters: int, outdir: str):
    """Trace the full MMT-PSM train step at the bench_train.py shapes."""
    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig
    from mmt_psm_tpu.train.mt_step import MTConfig, make_mt_step
    from mmt_psm_tpu.train.optim import make_optimizer
    from mmt_psm_tpu.train.supervised import batch_to_gt, create_train_state

    ycfg = get_cfg()
    ycfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs/pap/mmt_psm_r50_fpn.yaml")
    )
    cfg = ModelConfig.from_cfg(ycfg, train=True)
    model = MaskRCNN(config=cfg)
    b = generate_batch(0, batch, image_size=1024, max_instances=64)
    labeled = {
        "image": jnp.asarray(normalize_image(b["image"])),
        "image_size": jnp.asarray(b["image_size"]),
        "boxes": jnp.asarray(b["boxes"]),
        "labels": jnp.asarray(b["labels"]),
        "gt_valid": jnp.asarray(b["gt_valid"]),
        "masks": jnp.asarray(b["masks"]),
    }
    bu = generate_batch(1, batch, image_size=1024, max_instances=64)
    base = normalize_image(bu["image"])
    rngn = np.random.default_rng(3)
    unlabeled = {
        "t_images": jnp.asarray(
            np.stack([base + rngn.normal(0, 4, base.shape) for _ in range(2)], 1),
            jnp.float32,
        ),
        "s_images": jnp.asarray(
            np.stack([base + rngn.normal(0, 4, base.shape)], 1), jnp.float32
        ),
        "image_size": jnp.asarray(bu["image_size"]),
    }
    init_fn = jax.jit(
        lambda r, im, sz, gt: model.init(r, im, sz, gt, method=model.init_all)
    )
    params = init_fn(
        {
            "params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
        },
        labeled["image"][:1],
        labeled["image_size"][:1],
        batch_to_gt({k: v[:1] for k, v in labeled.items()}),
    )["params"]
    tx, _ = make_optimizer(get_cfg(), params)
    mt = MTConfig.from_cfg(get_cfg())
    state = create_train_state(params, tx, with_teacher=True)
    state = state.replace(step=jnp.asarray(mt.start_mt + 1, jnp.int32))
    rng = jax.random.PRNGKey(7)
    step = jax.jit(make_mt_step(model, tx, mt))
    s, m = step(state, labeled, unlabeled, rng)  # compile + warm
    float(jax.tree_util.tree_leaves(m)[0])
    with jax.profiler.trace(outdir):
        for _ in range(iters):
            s, m = step(s, labeled, unlabeled, rng)
        float(jax.tree_util.tree_leaves(m)[0])


def aggregate(outdir: str, batch: int, top: int = 40):
    """Parse the captured xplane (XSpace proto, read directly — the
    tensorboard_plugin_profile converter is version-broken against the
    installed tensorflow) into per-op device-time aggregates."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane under {outdir}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    # pick the device plane (TPU on hardware; the pjrt-client line on CPU)
    def device_lines(plane):
        for line in plane.lines:
            if line.name in ("XLA Ops", "Steps") or "XLAPjRtCpuClient" in line.name:
                yield line

    best = None
    for plane in xs.planes:
        if "TPU" in plane.name or ":CPU" in plane.name:
            lines = [
                l for l in device_lines(plane) if any(e.duration_ps for e in l.events)
            ]
            busy = sum(e.duration_ps for l in lines for e in l.events)
            if best is None or busy > best[1]:
                best = (plane, busy, lines)
    assert best is not None, [p.name for p in xs.planes]
    plane, _, lines = best
    md = plane.event_metadata
    smd = plane.stat_metadata

    def category(m):
        for st in m.stats:
            if smd[st.metadata_id].name in ("hlo_category", "category"):
                return st.str_value or smd[st.ref_value].name
        n = m.name
        for pre in ("fusion", "dot", "conv", "copy", "dynamic", "sort", "reduce",
                    "all-", "scatter", "gather", "custom-call", "transpose",
                    "broadcast", "iota", "select", "bitcast", "slice", "pad",
                    "concatenate"):
            if n.startswith(pre):
                return pre
        return "other"

    by_cat: dict = {}
    by_op: dict = {}
    total = 0.0
    for line in lines:
        for ev in line.events:
            m = md[ev.metadata_id]
            t = ev.duration_ps / 1e6  # us
            total += t
            by_cat[category(m)] = by_cat.get(category(m), 0.0) + t
            key = m.display_name or m.name
            by_op[key] = by_op.get(key, 0.0) + t

    print(f"\nplane: {plane.name}; lines: {[l.name for l in lines]}")
    print(f"total device event time: {total/1e3:.2f} ms (all traced iters)")
    print("\n== by category ==")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{k:40s} {v/1e3:9.2f} ms  {100*v/total:5.1f}%")
    print(f"\n== top {top} ops ==")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{k[:90]:90s} {v/1e3:8.2f} ms  {100*v/total:5.1f}%")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("infer", "mt"), default="infer")
    ap.add_argument("--batch", type=int, default=0, help="0 = mode default (16/4)")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--outdir", type=str, default="/tmp/flagship_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    batch = args.batch or (16 if args.mode == "infer" else 4)
    if not args.parse_only:
        (capture if args.mode == "infer" else capture_mt)(batch, args.iters, args.outdir)
    aggregate(args.outdir, batch, top=args.top)


if __name__ == "__main__":
    main()
