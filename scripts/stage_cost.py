"""Stage-wise FLOPs / HBM-bytes breakdown of the flagship graph.

Complements scripts/mfu_analysis.py (whole-graph roofline) and
scripts/profile_inference.py (stage wall time): compiles each stage of
the flagship inference graph separately and prints the XLA cost model's
flops and bytes-accessed per stage, to locate where the ~5.7 GB/patch
of HBM traffic goes. Compile-only on the host — safe to run while the
chip is busy (stages never execute; only param init touches the device).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np


def cost(fn, *args, name=""):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    fl = float(ca.get("flops", float("nan")))
    by = float(ca.get("bytes accessed", float("nan")))
    print(f"{name:28s} {fl/1e9:9.1f} GFLOP  {by/1e6:9.0f} MB")
    return fl, by


def main():
    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig
    from mmt_psm_tpu.models import rpn as RPN

    bsz = int(os.environ.get("MFU_BATCH", "16"))
    ycfg = get_cfg()
    ycfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..", "configs/pap/mmt_psm_r50_fpn.yaml"))
    cfg = ModelConfig.from_cfg(ycfg, train=False)
    model = MaskRCNN(config=cfg)
    b = generate_batch(0, bsz, image_size=1024, max_instances=64)
    images = jnp.asarray(normalize_image(b["image"]))
    sizes = jnp.asarray(np.full((bsz, 2), 1000, np.int32))
    params = jax.jit(lambda r, im, sz: model.init(r, im, sz, train=False))(
        {"params": jax.random.PRNGKey(0)}, images[:1], sizes[:1])

    print(f"batch {bsz}; per-stage cost (whole batch):")
    feats_fn = lambda p, x: model.apply(p, x, method=model.backbone_features)
    cost(feats_fn, params, images, name="backbone+fpn")
    feats = jax.jit(feats_fn)(params, images)

    rpn_fn = lambda p, f: model.apply(p, f, method=model.rpn_raw)
    cost(rpn_fn, params, feats, name="rpn head")
    rpn_out = jax.jit(rpn_fn)(params, feats)

    anchors = model.apply(params, method=lambda m: m._anchors())

    def select(obj, reg, sz):
        return RPN.select_proposals(
            obj, reg, anchors, sz,
            pre_nms_top_n=cfg.pre_nms_top_n_test,
            post_nms_top_n=cfg.post_nms_top_n_test,
            fpn_post_nms_top_n=cfg.fpn_post_nms_top_n_test,
            nms_thresh=cfg.rpn_nms_thresh,
            min_size=cfg.rpn_min_size,
            is_train=False,
        )

    sel_fn = lambda o, r, s: select(list(o), list(r), s)
    cost(sel_fn, rpn_out[0], rpn_out[1], sizes, name="proposal sel (nms)")
    props = jax.jit(sel_fn)(rpn_out[0], rpn_out[1], sizes)

    box_fn = lambda p, f, bx: model.apply(p, f, bx, True, method=model.box_predictions)
    cost(box_fn, params, feats, props.boxes, name="box head (pool+mlp)")
    class_logits, box_regression, box_feats = jax.jit(box_fn)(params, feats, props.boxes)

    from mmt_psm_tpu.models.relation import relation_nms_inference

    def rel_nms(p, bf, cl, br, pb, pv, sz):
        probs = jax.nn.softmax(cl.astype(jnp.float32), axis=-1)
        out = model.apply(
            p, bf, probs, br, pb, pv, sz,
            method=lambda m, *a: m.relation_nms(*a),
        )
        return jax.vmap(functools.partial(relation_nms_inference, cfg=cfg.relation))(out)

    cost(rel_nms, params, box_feats, class_logits, box_regression,
         props.boxes, props.valid, sizes, name="relation-NMS")
    boxes, scores, labels, valid = jax.jit(rel_nms)(
        params, box_feats, class_logits, box_regression, props.boxes, props.valid, sizes)

    mask_fn = lambda p, f, bx, im: model.apply(p, f, bx, im, method=model._mask_forward)
    cost(mask_fn, params, feats, boxes, images, name="mask head (pool+convs)")
    mask_out = jax.jit(mask_fn)(params, feats, boxes, images)

    refine_fn = lambda p, ml, mf, lb, v: model.apply(p, ml, mf, lb, v, method=model._refine_masks)
    cost(refine_fn, params, mask_out[0], mask_out[1], labels, valid, name="mask relation refine")


if __name__ == "__main__":
    main()
