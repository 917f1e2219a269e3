"""Stage-wise FLAGSHIP inference timing on the real chip (dev tool).

Times each stage of the graph bench.py measures (relation-NMS + mask
relation ON, 1024 canvas, batch 8). On the axon-tunnel platform every
host sync costs a ~RTT round trip, so a trivial-transfer baseline is
measured and reported alongside; stage times are raw (subtract the
baseline mentally when comparing small stages).
"""

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
    from mmt_psm_tpu.config import get_cfg

    bsz = 8
    ycfg = get_cfg()
    ycfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..", "configs/pap/mmt_psm_r50_fpn.yaml"))
    cfg = ModelConfig.from_cfg(ycfg, train=False)
    assert cfg.with_relation_nms and cfg.with_relation_mask
    model = MaskRCNN(config=cfg)
    b = generate_batch(0, bsz, image_size=1024, max_instances=64)
    images = jnp.asarray(normalize_image(b["image"]))
    sizes = jnp.asarray(np.full((bsz, 2), 1000, np.int32))
    params = jax.jit(lambda r, im, sz: model.init(r, im, sz, train=False))(
        {"params": jax.random.PRNGKey(0)}, images[:1], sizes[:1])

    # host-sync baseline: everything below includes ~this much RTT
    zero = jax.jit(lambda: jnp.zeros(()))
    timeit(lambda: zero(), name="(host-sync baseline)")

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
    class_logits, box_regression, box_feats = box_out

    import functools

    from mmt_psm_tpu.models.relation import relation_nms_inference

    def rel_nms(p, bf, cl, br, pb, pv, sz):
        probs = jax.nn.softmax(cl.astype(jnp.float32), axis=-1)
        out = model.apply(
            p, bf, probs, br, pb, pv, sz,
            method=lambda m, *a: m.relation_nms(*a),
        )
        return jax.vmap(functools.partial(relation_nms_inference, cfg=cfg.relation))(out)

    rel_fn = jax.jit(rel_nms)
    boxes, scores, labels, valid = timeit(
        rel_fn, params, box_feats, class_logits, box_regression,
        props.boxes, props.valid, sizes, name="relation-NMS",
    )

    mask_fn = jax.jit(lambda p, f, bx, im: model.apply(p, f, bx, im, method=model._mask_forward))
    mask_out = timeit(mask_fn, params, feats, boxes, images, name="mask head (pool+convs)")

    refine_fn = jax.jit(
        lambda p, ml, mf, lb, v: model.apply(p, ml, mf, lb, v, method=model._refine_masks)
    )
    timeit(refine_fn, params, mask_out[0], mask_out[1], labels, valid, name="mask relation refine")

    full = jax.jit(lambda p, x, s: model.apply(p, x, s, train=False).scores)
    timeit(full, params, images, sizes, name="FULL inference")
    print(f"\nbatch {bsz}; stages include the host-sync baseline above")


if __name__ == "__main__":
    main()
