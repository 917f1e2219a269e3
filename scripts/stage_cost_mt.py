"""Stage-wise decomposition of the full MMT-PSM train step.

VERDICT r3 item 2 asks for a stage-level profile of the MT step naming
the true bottleneck after the windowed ROIAlign backward. bench_train.py
reports the whole step (352.6 ms / 15687 GFLOP at b4); this script
compiles each stage of train/mt_step.py separately and prints the XLA
cost model's FLOPs + HBM bytes per stage, and with ``--time`` also
wall-times each stage on the chip (inputs pre-staged, one draining
read per window, same hygiene as bench_train.py).

Stages mirror unlabeled_losses() + the supervised term
(reference call stack: MTtrainer.py:172-275 ->
generalized_rcnn.forward_teacher:117-167 / forward_student:170-199):

  sup_fwd_bwd        supervised value_and_grad (labeled batch)
  opt_ema            SGD update + EMA teacher pytree op
  t_backbone_4view   teacher backbone, 2K aug views stacked [2K*B]
  t_pseudo_infer     pseudo-label inference from view-0 features
                     (RPN select + box head + relation-NMS + masks)
  t_integral_paste   pasted integral foreground canvas (MGD hint)
  t_hint_emb         hint-adaptor embeddings over the 2K-view pyramid
  t_proposals        train-mode RPN selection + balanced subsample
  t_box_preds        teacher box-head logits over 2K views (PSM input)
  s_unlabeled_bwd    student [S*B] backbone + embeddings + box head +
                     PSM/MGD losses, value_and_grad wrt student params

Compile-only by default (stages never execute — safe while the chip is
busy); the cost-model sum is compared against the whole-step number to
show nothing is unaccounted.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _cost(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return (
        float(ca.get("flops", float("nan"))),
        float(ca.get("bytes accessed", float("nan"))),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", action="store_true", help="also wall-time each stage")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig
    from mmt_psm_tpu.models.box_head import subsample_proposals
    from mmt_psm_tpu.ops.paste import paste_integral
    from mmt_psm_tpu.structures.boxes import hflip_boxes
    from mmt_psm_tpu.structures.detections import GroundTruth
    from mmt_psm_tpu.train.mt_step import (
        MTConfig,
        hflip_image,
        mgd_loss,
        psm_loss,
    )
    from mmt_psm_tpu.train.optim import make_optimizer
    from mmt_psm_tpu.train.supervised import batch_to_gt
    from mmt_psm_tpu.train.ema import ema_update

    batch, size = 4, 1024
    ycfg = get_cfg()
    ycfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs/pap/mmt_psm_r50_fpn.yaml")
    )
    cfg = ModelConfig.from_cfg(ycfg, train=True)
    model = MaskRCNN(config=cfg)
    mt = MTConfig.from_cfg(ycfg)
    c = cfg

    b = generate_batch(0, batch, image_size=size, max_instances=64)
    labeled = {
        "image": jnp.asarray(normalize_image(b["image"])),
        "image_size": jnp.asarray(b["image_size"]),
        "boxes": jnp.asarray(b["boxes"]),
        "labels": jnp.asarray(b["labels"]),
        "gt_valid": jnp.asarray(b["gt_valid"]),
        "masks": jnp.asarray(b["masks"]),
    }
    bu = generate_batch(1, batch, image_size=size, max_instances=64)
    base = normalize_image(bu["image"])
    rngn = np.random.default_rng(3)
    t_images = jnp.asarray(
        np.stack([base + rngn.normal(0, 4, base.shape) for _ in range(mt.aug_k)], 1),
        jnp.float32,
    )
    s_images = jnp.asarray(np.stack([base + rngn.normal(0, 4, base.shape)], 1), jnp.float32)
    sizes = jnp.asarray(bu["image_size"])

    init_fn = jax.jit(lambda r, im, sz, gt: model.init(r, im, sz, gt, method=model.init_all))
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
    opt_state = jax.jit(tx.init)(params)

    r_sample, r_drop = jax.random.split(jax.random.PRNGKey(7))
    canvas_size = c.image_size // mt.mgd_canvas_stride
    n_views = 2 * mt.aug_k
    bsz = batch

    # ---- stage functions -------------------------------------------------
    def sup_fwd_bwd(p, lab):
        def loss_fn(pp):
            losses = model.apply(
                {"params": pp}, lab["image"], lab["image_size"], batch_to_gt(lab),
                train=True, rngs={"sample": r_sample, "dropout": r_drop},
            )
            return sum(jnp.asarray(v, jnp.float32) for v in losses.values())
        return jax.value_and_grad(loss_fn)(p)

    def opt_ema(p, grads, os_, teacher):
        updates, os2 = tx.update(grads, os_, p)
        import optax
        p2 = optax.apply_updates(p, updates)
        t2 = ema_update(teacher, p2, jnp.asarray(100, jnp.int32), mt.alpha)
        return p2, os2, t2

    def t_backbone(p, t_imgs):
        views = []
        for k in range(mt.aug_k):
            views.append(t_imgs[:, k])
            views.append(hflip_image(t_imgs[:, k]))
        stacked = jnp.concatenate(views, axis=0)
        return model.apply({"params": p}, stacked, method=model.backbone_features)

    def t_pseudo(p, feats_all, szs, img0):
        f0 = tuple(f[:bsz] for f in feats_all)
        return model.apply(
            {"params": p}, f0, szs, img0, method=model.detections_from_features
        )

    def t_integral(dets):
        return jax.vmap(
            lambda m, bx, v: paste_integral(m, bx, v, canvas_size, float(mt.mgd_canvas_stride))
        )(dets.masks, dets.boxes, dets.valid)

    def t_hint(p, feats_all):
        return model.apply({"params": p}, feats_all, method=model.hint_embeddings)

    def t_props(p, feats_all, szs, pseudo, r):
        f0 = tuple(f[:bsz] for f in feats_all)
        proposals = model.apply({"params": p}, f0, szs, pseudo, method=model.teacher_proposals)
        return subsample_proposals(
            r, proposals, pseudo,
            batch_size_per_image=c.box_batch_per_image,
            positive_fraction=c.box_positive_fraction,
            fg_thresh=c.box_fg_iou, bg_thresh=c.box_bg_iou,
            reg_weights=c.reg_weights,
        )

    def t_box_preds(p, feats_all, rois_boxes):
        flipped = hflip_boxes(rois_boxes, c.image_size)
        boxes_all = jnp.concatenate(
            [flipped if v % 2 == 1 else rois_boxes for v in range(n_views)], axis=0
        )
        return model.apply(
            {"params": p}, feats_all, boxes_all, True,
            method=model.box_predictions, roi_chunk=128,
        )[0]

    def s_unlabeled_bwd(p, s_imgs, rois_boxes, rois_labels, rois_valid, t_logits_all, t_embs_all, integral):
        flipped = hflip_boxes(rois_boxes, c.image_size)
        n_s = s_imgs.shape[1]

        def loss_fn(pp):
            sv = {"params": pp}
            s_views = [
                hflip_image(s_imgs[:, si]) if si % 2 == 1 else s_imgs[:, si]
                for si in range(n_s)
            ]
            s_stacked = jnp.concatenate(s_views, axis=0)
            s_feats_all = model.apply(sv, s_stacked, method=model.backbone_features)
            s_embs_all = model.apply(sv, s_feats_all, method=model.hint_embeddings)
            s_boxes_all = jnp.concatenate(
                [flipped if si % 2 == 1 else rois_boxes for si in range(n_s)], axis=0
            )
            s_logits_all = model.apply(
                sv, s_feats_all, s_boxes_all, False,
                method=model.box_predictions, rngs={"dropout": r_drop}, roi_chunk=128,
            )[0]
            s_logits = [s_logits_all[i * bsz : (i + 1) * bsz] for i in range(n_s)]
            t_logits = [t_logits_all[v * bsz : (v + 1) * bsz] for v in range(n_views)]
            t_embs = [
                tuple(e[v * bsz : (v + 1) * bsz] for e in t_embs_all) for v in range(n_views)
            ]
            s_embs = [
                tuple(e[i * bsz : (i + 1) * bsz] for e in s_embs_all) for i in range(n_s)
            ]
            lp = psm_loss(s_logits, t_logits, rois_labels, rois_valid, mt, c.num_classes)
            lm = mgd_loss(t_embs, s_embs, integral, mt)
            return jnp.asarray(lp, jnp.float32) + jnp.asarray(lm, jnp.float32)

        return jax.value_and_grad(loss_fn)(p)

    # ---- materialize stage inputs (shape-only unless --time) --------------
    feats_shape = jax.eval_shape(t_backbone, params, t_images)
    dets_shape = jax.eval_shape(
        t_pseudo, params, feats_shape, sizes, t_images[:, 0]
    )
    pseudo_shape = GroundTruth(
        boxes=dets_shape.boxes, labels=dets_shape.labels, valid=dets_shape.valid
    )
    rois_shape = jax.eval_shape(
        t_props, params, feats_shape, sizes, pseudo_shape, jax.random.PRNGKey(5)
    )
    logits_shape = jax.eval_shape(t_box_preds, params, feats_shape, rois_shape.boxes)
    embs_shape = jax.eval_shape(t_hint, params, feats_shape)
    integral_shape = jax.eval_shape(t_integral, dets_shape)
    grads_shape = jax.eval_shape(sup_fwd_bwd, params, labeled)[1]

    stages = [
        ("sup_fwd_bwd", sup_fwd_bwd, (params, labeled)),
        ("opt_ema", opt_ema, (params, grads_shape, opt_state, params)),
        ("t_backbone_4view", t_backbone, (params, t_images)),
        ("t_pseudo_infer", t_pseudo, (params, feats_shape, sizes, t_images[:, 0])),
        ("t_integral_paste", t_integral, (dets_shape,)),
        ("t_hint_emb", t_hint, (params, feats_shape)),
        ("t_proposals", t_props, (params, feats_shape, sizes, pseudo_shape, jax.random.PRNGKey(5))),
        ("t_box_preds", t_box_preds, (params, feats_shape, rois_shape.boxes)),
        (
            "s_unlabeled_bwd",
            s_unlabeled_bwd,
            (
                params, s_images, rois_shape.boxes, rois_shape.labels,
                rois_shape.valid, logits_shape, embs_shape, integral_shape,
            ),
        ),
    ]

    print(f"{'stage':20s} {'GFLOP':>9s} {'MB':>9s}" + ("   ms" if args.time else ""))
    tot_fl = 0.0
    results = []
    for name, fn, sargs in stages:
        compiled = jax.jit(fn).lower(*sargs).compile()
        fl, by = _cost(compiled)
        tot_fl += fl
        row = {"stage": name, "gflop": round(fl / 1e9, 1), "mb": round(by / 1e6, 0)}
        if args.time:
            # materialize real inputs by replaying the chain
            def real(x):
                if isinstance(x, jax.ShapeDtypeStruct):
                    return jnp.zeros(x.shape, x.dtype)
                return jax.tree_util.tree_map(
                    lambda l: jnp.zeros(l.shape, l.dtype)
                    if isinstance(l, jax.ShapeDtypeStruct)
                    else l,
                    x,
                )
            rargs = tuple(real(a) for a in sargs)
            out = compiled(*rargs)
            jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
            t0 = time.perf_counter()
            outs = []
            for _ in range(args.iters):
                outs.append(compiled(*rargs))
            leaf = jax.tree_util.tree_leaves(outs[-1])[0]
            jnp.asarray(leaf).block_until_ready()
            row["ms"] = round((time.perf_counter() - t0) / args.iters * 1000, 1)
        print(
            f"{name:20s} {row['gflop']:9.1f} {row['mb']:9.0f}"
            + (f" {row['ms']:6.1f}" if args.time else "")
        )
        results.append(row)

    print(json.dumps({"stages": results, "sum_gflop": round(tot_fl / 1e9, 1)}))


if __name__ == "__main__":
    main()
