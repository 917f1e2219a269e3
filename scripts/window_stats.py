"""Distinct-window statistics for the Pallas pooler on REAL proposals.

The windowed-DMA pooler (ops/roi_align_pallas.py) dedups identical
8-aligned windows: RoIs are sorted by window identity and only the
first of each group pays the HBM->VMEM DMA. Its traffic is therefore

    distinct_windows x (window+A)^2 x C x itemsize

where A is the start-alignment granularity (currently 8). Coarsening A
trades bigger windows for fewer distinct ones — on clustered pap
proposals the dedup can win. This script pulls the ACTUAL flagship
proposal/detection boxes off the chip (same graph bench.py measures)
and sweeps A offline, reporting projected bytes + ms at HBM bandwidth
for the box-head (1000 RoIs/img) and mask-head (200 RoIs/img) poolers.

Usage: python scripts/window_stats.py  (chip required; ~2 min from a
warm compile cache)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

HBM_GBPS = 819.0  # v5e HBM bandwidth
C = 256
ITEMSIZE = 2  # bf16
WINDOW = 48  # pooler support window before alignment widening


def window_plan_stats(boxes, valid, scales, shapes, window, align):
    """numpy mirror of roi_align_pallas._window_plan's window identity.

    boxes: [B, N, 4]; returns dict with distinct-window count and bytes.
    """
    bsz, n = boxes.shape[:2]
    flat = boxes.reshape(-1, 4).astype(np.float64)
    area = np.maximum(flat[:, 2] - flat[:, 0], 0) * np.maximum(flat[:, 3] - flat[:, 1], 0)
    s = np.sqrt(area)
    k_min = int(-np.log2(scales[0]))
    k_max = int(-np.log2(scales[-1]))
    lvl = np.floor(4 + np.log2(s / 224 + 1e-6))
    lvl = np.clip(lvl, k_min, k_max).astype(np.int64) - k_min

    window_y = window + align
    window_x = window + align
    pad_h = np.asarray([max(window_y, sh[0]) for sh in shapes])
    pad_w = np.asarray([max(window_x, sh[1]) for sh in shapes])

    scale = np.asarray(scales)[lvl]
    sx = flat[:, 0] * scale
    sy = flat[:, 1] * scale
    oy = np.clip(np.floor(sy) - 1, 0, pad_h[lvl] - window_y).astype(np.int64)
    ox = np.clip(np.floor(sx) - 1, 0, pad_w[lvl] - window_x).astype(np.int64)
    oy = (oy // align) * align
    ox = (ox // align) * align
    b_idx = np.repeat(np.arange(bsz), n)

    key = ((b_idx * 4 + lvl) * 4096 + oy // 8) * 4096 + ox // 8
    distinct = len(np.unique(key))
    win_bytes = window_y * window_x * C * ITEMSIZE
    total = distinct * win_bytes
    return {
        "align": align,
        "window": (window_y, window_x),
        "rois": len(flat),
        "distinct": distinct,
        "MB": total / 1e6,
        "ms_at_bw": total / (HBM_GBPS * 1e6),
        "level_hist": np.bincount(lvl, minlength=4).tolist(),
    }


def main():
    import jax
    import jax.numpy as jnp

    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig
    from mmt_psm_tpu.models import rpn as RPN

    bsz = 16
    ycfg = get_cfg()
    ycfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs/pap/mmt_psm_r50_fpn.yaml")
    )
    cfg = ModelConfig.from_cfg(ycfg, train=False)
    model = MaskRCNN(config=cfg)
    b = generate_batch(0, bsz, image_size=1024, max_instances=64)
    images = jnp.asarray(normalize_image(b["image"]))
    sizes = jnp.asarray(np.full((bsz, 2), 1000, np.int32))
    params = jax.jit(lambda r, im, sz: model.init(r, im, sz, train=False))(
        {"params": jax.random.PRNGKey(0)}, images[:1], sizes[:1]
    )

    anchors = model.apply(params, method=lambda m: m._anchors())

    @jax.jit
    def stages(p, x, sz):
        feats = model.apply(p, x, method=model.backbone_features)
        obj, reg = model.apply(p, feats, method=model.rpn_raw)
        props = RPN.select_proposals(
            list(obj), list(reg), anchors, sz,
            pre_nms_top_n=cfg.pre_nms_top_n_test,
            post_nms_top_n=cfg.post_nms_top_n_test,
            fpn_post_nms_top_n=cfg.fpn_post_nms_top_n_test,
            nms_thresh=cfg.rpn_nms_thresh,
            min_size=cfg.rpn_min_size,
            is_train=False,
        )
        d = model.apply(p, x, sz, train=False)
        return props.boxes, props.valid, d.boxes, d.valid

    t0 = time.time()
    pb, pv, db, dv = jax.device_get(stages(params, images, sizes))
    print(f"chip stage pull done in {time.time()-t0:.0f}s; "
          f"proposals {pb.shape}, detections {db.shape}", file=sys.stderr)
    if "--save" in sys.argv:
        np.savez("/tmp/flagship_rois.npz", prop_boxes=pb, prop_valid=pv,
                 det_boxes=db, det_valid=dv)
        print("saved /tmp/flagship_rois.npz", file=sys.stderr)

    size = cfg.image_size
    shapes = [(size // 4, size // 4), (size // 8, size // 8),
              (size // 16, size // 16), (size // 32, size // 32)]
    scales = (0.25, 0.125, 0.0625, 0.03125)

    for name, boxes, valid in (("box_head", pb, pv), ("mask_head", db, dv)):
        nvalid = int(np.asarray(valid).sum())
        print(f"\n== {name}: {boxes.shape[0]}x{boxes.shape[1]} RoIs "
              f"({nvalid} valid) ==")
        for align in (8, 16, 32, 64, 96, 128):
            st = window_plan_stats(np.asarray(boxes), np.asarray(valid),
                                   scales, shapes, WINDOW, align)
            print(
                f"A={align:3d} win={st['window'][0]:3d} "
                f"distinct={st['distinct']:5d}/{st['rois']} "
                f"traffic={st['MB']:8.1f} MB  ~{st['ms_at_bw']:6.2f} ms/batch "
                f"({st['ms_at_bw']/bsz*1000:6.0f} us/patch) "
                f"levels={st['level_hist']}"
            )


if __name__ == "__main__":
    main()
