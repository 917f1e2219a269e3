"""Stage-wise inference timing on the real chip (dev tool)."""

import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
from mmt_psm_tpu.models import MaskRCNN, ModelConfig
from mmt_psm_tpu.models import rpn as RPN


def timeit(fn, *args, iters=8, name=""):
    out = fn(*args)
    s = float(jax.tree_util.tree_leaves(out)[0].sum())  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        s = float(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1000:8.2f} ms")
    return out


def main():
    bsz = 4
    cfg = ModelConfig(image_size=1024)
    model = MaskRCNN(config=cfg)
    b = generate_batch(0, bsz, image_size=1024, max_instances=64)
    images = jnp.asarray(normalize_image(b["image"]))
    sizes = jnp.asarray(np.full((bsz, 2), 1000, np.int32))
    params = jax.jit(lambda r, im, sz: model.init(r, im, sz, train=False))(
        {"params": jax.random.PRNGKey(0)}, images[:1], sizes[:1])

    feats_fn = jax.jit(lambda p, x: model.apply(p, x, method=model.backbone_features))
    feats = timeit(feats_fn, params, images, name="backbone+fpn")

    rpn_fn = jax.jit(lambda p, f: model.apply(p, f, method=model.rpn_raw))
    rpn_out = timeit(rpn_fn, params, feats, name="rpn head")

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

    sel_fn = jax.jit(lambda o, r, s: select(list(o), list(r), s))
    props = timeit(sel_fn, rpn_out[0], rpn_out[1], sizes, name="proposal sel (nms)")

    box_fn = jax.jit(lambda p, f, bx: model.apply(p, f, bx, True, method=model.box_predictions))
    box_out = timeit(box_fn, params, feats, props.boxes, name="box head (pool+mlp)")

    from mmt_psm_tpu.models import box_head as BH

    post_fn = jax.jit(
        lambda cl, br, pb, pv, sz: BH.postprocess_boxes(
            cl, br,
            type(props)(boxes=pb, scores=jnp.zeros(pb.shape[:2]), valid=pv),
            sz,
            num_classes=cfg.num_classes,
            score_thresh=cfg.score_thresh,
            nms_thresh=cfg.nms_thresh,
            detections_per_img=cfg.detections_per_img,
            reg_weights=cfg.reg_weights,
        )
    )
    dets = timeit(post_fn, box_out[0], box_out[1], props.boxes, props.valid, sizes, name="box postproc (cls nms)")

    mask_fn = jax.jit(lambda p, f, bx: model.apply(p, f, bx, method=model._mask_forward))
    timeit(mask_fn, params, feats, dets.boxes, name="mask head (pool+convs)")

    full = jax.jit(lambda p, x, s: model.apply(p, x, s, train=False).scores)
    timeit(full, params, images, sizes, name="FULL inference")


if __name__ == "__main__":
    main()
