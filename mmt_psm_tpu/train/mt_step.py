"""Mean-teacher MMT-PSM training step: PSM + MGD, fully jitted.

Reimplements the reference's unlabeled branch (reference:
maskrcnn_benchmark/engine/MTtrainer.py:247-275 ->
generalized_rcnn.forward_teacher:117-167 / forward_student:170-199)
as pure functions over the MaskRCNN sub-forwards:

* Teacher inference on aug view 0 produces pseudo ground truth
  (generalized_rcnn.py:122-127); its pasted masks sum into the MGD
  integral foreground canvas (:129-131).
* Teacher runs the backbone on each of K color-aug views AND their
  horizontal flips -> 2K feature pyramids (extract_aug_feat :201-215).
* Box RoIs come from train-mode RPN selection + balanced subsampling
  against the pseudo gt, shared across views; flipped views use
  flipped RoIs (box_head.py:77-100).
* PSM (box_head/loss.py:185-237): teacher per-view softmax probs give a
  mean/std; hard negatives = highest-std negatives, kept at pos:neg=2:1;
  student soft-CE against sharpen(softmax(mean raw logits), T) with
  negative weight CLS_BALANCE_WEIGHT, normalized over selected samples
  and divided by the reference's literal /3 class constant
  (box_head/loss.py:281-286).
* MGD (generalized_rcnn.py:243-282): masked MSE between hint-adaptor
  embeddings, teacher flips unflipped, averaged over
  (teacher view x student view x level).
* Loss weighting (MTtrainer.py:67-109): 'mt*' keys gated by
  lambda * ramp(step); note the reference passes rampup_length into the
  rampdown call (line 92) — replicated verbatim.
* EMA teacher update alpha=min(1-1/(i+1), ALPHA) starting at
  START_MT-10 (MTtrainer.py:195-196, 277-281).

Flips operate on the fixed padded canvas (image and boxes flip by the
canvas width); the reference flips the padded tensor and true-size
boxes, identical when sizes divide evenly as in the pap configs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..ops.paste import paste_integral
from ..structures.boxes import hflip_boxes
from ..structures.detections import GroundTruth
from ..utils.ramp import sigmoid_rampdown, sigmoid_rampup
from .ema import ema_update
from .supervised import TrainState, batch_to_gt


@dataclasses.dataclass(frozen=True)
class MTConfig:
    lambda_: float = 5.0
    alpha: float = 0.99
    rampup_step: int = 250
    rampdown_step: int = 250
    start_mt: int = 1000
    max_iter: int = 7000
    aug_k: int = 2
    aug_s: int = 1
    temp: float = 0.5
    sharpen: bool = True
    rank_filter: float = 0.2
    hard_neg: bool = True
    cls_balance_weight: float = 1.5
    cls_loss_weight: float = 0.2
    fg_hint: float = 1.0
    nms_loss_weight: float = 1.0
    flip: bool = True
    mgd_canvas_stride: int = 4  # integral mask computed at P2 resolution
    # compared methods retained by the reference (MT.ODKD / MT.FFI,
    # config/defaults.py:356-357)
    odkd: bool = False
    ffi: bool = False
    # pseudo-label training: the consistency batch carries real GT and
    # the teacher uses it instead of its own inference
    # (MT.PLTRAIN, generalized_rcnn.py:133-138)
    pltrain: bool = False

    @classmethod
    def from_cfg(cls, cfg) -> "MTConfig":
        return cls(
            lambda_=cfg.MT.LAMBDA,
            alpha=cfg.MT.ALPHA,
            rampup_step=cfg.MT.RAMPUP_STEP,
            rampdown_step=cfg.MT.RAMPDOWN_STEP,
            start_mt=cfg.MT.START_MT,
            max_iter=cfg.SOLVER.MAX_ITER,
            aug_k=cfg.MT.AUG_K,
            aug_s=cfg.MT.AUG_S,
            temp=cfg.MT.TEMP,
            sharpen=cfg.MT.SHARPEN,
            rank_filter=cfg.MT.RANK_FILTER,
            hard_neg=cfg.MT.HARD_NEG,
            cls_balance_weight=cfg.MT.CLS_BALANCE_WEIGHT,
            cls_loss_weight=cfg.MT.CLS_LOSS,
            fg_hint=cfg.MT.FG_HINT,
            nms_loss_weight=cfg.MODEL.RELATION_NMS.LOSS,
            flip=cfg.MT.FLIP,
            odkd=cfg.MT.ODKD,
            ffi=cfg.MT.FFI,
            pltrain=cfg.MT.PLTRAIN,
        )


def hflip_image(x):
    """Flip NHWC (or HWC) images along W."""
    return jnp.flip(x, axis=-2)


def hflip_feature(f):
    """Flip an NHWC feature map along W (utils/miscellaneous batch_hfilp)."""
    return jnp.flip(f, axis=-2)


# ---------------------------------------------------------------------- PSM
def psm_loss(student_logits_views, teacher_logits_views, labels, valid, mt: MTConfig, num_classes: int):
    """Proposal soft-matching classification consistency.

    student/teacher_logits_views: lists of [B, S, C]; labels/valid: [B, S]
    from the teacher's pseudo-gt subsampling. Selection happens over the
    flattened batch, matching the reference's cat-over-images
    (box_head/loss.py:187).
    """
    c = num_classes
    t = jnp.stack([x.reshape(-1, c).astype(jnp.float32) for x in teacher_logits_views])  # [Vt, N, C]
    t = jax.lax.stop_gradient(t)
    labels_f = labels.reshape(-1)
    valid_f = valid.reshape(-1)

    probs = jax.nn.softmax(t, axis=-1)
    std_probs = jnp.std(probs, axis=0, ddof=1)  # torch.std is unbiased
    mean_raw = jnp.mean(t, axis=0)  # the PSM target logits (loss.py:165-166)
    sigma = jnp.sum(std_probs, axis=-1)  # [N]

    pos = (labels_f > 0) & valid_f
    neg = (labels_f == 0) & valid_f
    n_pos = jnp.sum(pos)

    # hard negatives: top (n_pos // 2) by sigma among negatives
    neg_sigma = jnp.where(neg, sigma, -jnp.inf)
    order = jnp.argsort(-neg_sigma)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    keep_neg = neg & (rank < n_pos // 2)

    sel = pos | keep_neg
    w = jnp.where(pos, 1.0, 0.0) + jnp.where(keep_neg, mt.cls_balance_weight if mt.hard_neg else 1.0, 0.0)

    target = jax.nn.softmax(mean_raw, axis=-1)
    if mt.sharpen:
        p = target ** (1.0 / mt.temp)
        target = p / jnp.sum(p, axis=-1, keepdims=True)
    target = jax.lax.stop_gradient(target)

    n_sel = jnp.maximum(jnp.sum(sel), 1)
    losses = []
    for s_logits in student_logits_views:
        logp = jax.nn.log_softmax(s_logits.reshape(-1, c).astype(jnp.float32), axis=-1)
        # reference: (-t * logp * w).mean(0).sum() / 3 over selected rows
        per = -jnp.sum(target * logp, axis=-1) * w
        losses.append(jnp.sum(per) / (n_sel.astype(jnp.float32) * 3.0))
    return jnp.mean(jnp.stack(losses))


# ---------------------------------------------------------------------- MGD
def mgd_loss(teacher_emb_views, student_emb_views, integral_canvas, mt: MTConfig):
    """Mask-guided foreground feature distillation
    (generalized_rcnn.py:243-282).

    teacher_emb_views: list over 2K views of tuples of per-level
    [B, h, w, D]; odd views were computed on flipped images and are
    unflipped here. student_emb_views: list over S views (odd = flipped,
    unflipped here before compare). integral_canvas: [B, Hc, Wc] pasted
    instance-mask counts at mgd_canvas_stride.
    """
    num_levels = len(teacher_emb_views[0])
    canvas = integral_canvas[..., None]  # [B, Hc, Wc, 1]

    masks = []
    for lvl in range(num_levels):
        h = teacher_emb_views[0][lvl].shape[1]
        factor = canvas.shape[1] // h
        if factor > 1:
            import flax.linen as nn

            pooled = nn.avg_pool(canvas, (factor, factor), strides=(factor, factor))
        else:
            pooled = canvas
        masks.append((pooled > 0.5).astype(jnp.float32))  # [B, h, w, 1]

    dists = []
    for vi, t_view in enumerate(teacher_emb_views):
        t_view = [
            hflip_feature(f) if vi % 2 == 1 else f for f in t_view
        ]
        t_view = [jax.lax.stop_gradient(f.astype(jnp.float32)) for f in t_view]
        for si, s_view in enumerate(student_emb_views):
            for s_f, t_f, m in zip(s_view, t_view, masks):
                s_f = s_f.astype(jnp.float32)
                if si % 2 == 1:
                    s_f = hflip_feature(s_f)
                d = jnp.sum(((s_f - t_f) ** 2) * m) / (jnp.sum(m) * s_f.shape[-1] + 1e-7)
                dists.append(d)
    return jnp.mean(jnp.stack(dists))


# -------------------------------------------------- compared methods
def odkd_loss(student_logits, teacher_logits, labels, valid, neg_weight: float = 1.5):
    """ODKD baseline: single-view soft CE with 1.5x negative weight
    (box_head/loss.py:239-255). student/teacher_logits: [B, S, C]."""
    c = student_logits.shape[-1]
    s = student_logits.reshape(-1, c).astype(jnp.float32)
    t = jax.lax.stop_gradient(teacher_logits.reshape(-1, c).astype(jnp.float32))
    labels_f = labels.reshape(-1)
    valid_f = valid.reshape(-1)
    logp = jax.nn.log_softmax(s, axis=-1)
    target = jax.nn.softmax(t, axis=-1)
    w = jnp.where(labels_f == 0, neg_weight, 1.0) * valid_f.astype(jnp.float32)
    per = -target * logp * w[:, None]
    # reference: elementwise mean over all (rows x classes)
    return jnp.sum(per) / jnp.maximum(jnp.sum(valid_f) * c, 1.0)


def ffi_hint_loss(teacher_emb_view0, student_emb_view0, box_canvas):
    """FFI baseline: box-canvas-masked feature MSE between the unflipped
    view-0 embeddings (generalized_rcnn.py:284-294). box_canvas:
    [B, Hc, Wc] 1 inside any foreground box."""
    import flax.linen as nn

    canvas = box_canvas[..., None]
    dists = []
    for s_f, t_f in zip(student_emb_view0, teacher_emb_view0):
        s_f = s_f.astype(jnp.float32)
        t_f = jax.lax.stop_gradient(t_f.astype(jnp.float32))
        factor = canvas.shape[1] // s_f.shape[1]
        m = canvas if factor <= 1 else nn.avg_pool(canvas, (factor, factor), strides=(factor, factor))
        m = (m > 0.5).astype(jnp.float32)
        dists.append(jnp.sum(((s_f - t_f) ** 2) * m) / jnp.maximum(jnp.sum(m) * s_f.shape[-1], 1.0))
    return jnp.mean(jnp.stack(dists))


def naive_hint_loss(teacher_emb_view0, student_emb_view0):
    """ODKD naive hint: unmasked feature MSE (generalized_rcnn.py:296-302)."""
    dists = []
    for s_f, t_f in zip(student_emb_view0, teacher_emb_view0):
        s_f = s_f.astype(jnp.float32)
        t_f = jax.lax.stop_gradient(t_f.astype(jnp.float32))
        dists.append(jnp.mean((s_f - t_f) ** 2))
    return jnp.mean(jnp.stack(dists))


def boxes_to_canvas(boxes, valid, canvas_size: int, stride: float):
    """Binary canvas with 1 inside any valid box (the FFI box region
    finder, rpn/inference.py:174-191). boxes: [K, 4] image coords."""
    xs = (jnp.arange(canvas_size, dtype=jnp.float32) + 0.5) * stride - 0.5
    inside_x = (xs[None, :] >= boxes[:, 0:1]) & (xs[None, :] <= boxes[:, 2:3])  # [K, W]
    inside_y = (xs[None, :] >= boxes[:, 1:2]) & (xs[None, :] <= boxes[:, 3:4])  # [K, H]
    hit = jnp.einsum(
        "kh,kw->hw",
        (inside_y & valid[:, None]).astype(jnp.float32),
        inside_x.astype(jnp.float32),
    )
    return (hit > 0).astype(jnp.float32)


# ------------------------------------------------------------ loss weighting
def mt_loss_weight(step, mt: MTConfig):
    """weight(step) from MTtrainer.weight_sum_losses (MTtrainer.py:89-94)."""
    step = step.astype(jnp.float32)
    gap = step - mt.start_mt
    in_rampup = (gap < mt.rampup_step) & (gap > 0)
    in_rampdown = (mt.max_iter - step) < mt.rampdown_step
    up = mt.lambda_ * sigmoid_rampup(gap, mt.rampup_step)
    # reference quirk: rampdown is called with rampup_length (line 92)
    down = mt.lambda_ * sigmoid_rampdown(mt.max_iter - step, mt.rampup_step)
    return jnp.where(in_rampup, up, jnp.where(in_rampdown, down, mt.lambda_))


def weight_sum_losses(loss_dict, step, mt: MTConfig):
    """Gate 'mt*' keys by the ramp weight, apply balanced per-key weights
    (MTtrainer.py:96-109, 141-145)."""
    weight = mt_loss_weight(step, mt)
    balanced = {
        "mt_classifier": mt.cls_loss_weight,
        "nms_loss": mt.nms_loss_weight,
        "mt_fg_loss": mt.fg_hint,
    }
    out = {}
    for k, v in loss_dict.items():
        v = jnp.asarray(v, jnp.float32)
        if "mt" in k:
            v = weight * v
        if k in balanced:
            v = v * balanced[k]
        out[k] = v
    return out


# ------------------------------------------------------------ unlabeled pass
def gt_integral_canvas(masks, valid, canvas_size: int):
    """Integral foreground canvas from full-frame GT bitmasks: per-image
    sum of instance masks, nearest-resampled to the MGD canvas (the
    PLTRAIN branch's masks.decode path, generalized_rcnn.py:133-138).
    masks: [B, M, Hm, Wm]; valid: [B, M]."""
    m = (masks > 0).astype(jnp.float32) * valid[:, :, None, None].astype(jnp.float32)
    integral = jnp.sum(m, axis=1)  # [B, Hm, Wm]
    step = integral.shape[1] // canvas_size
    if step > 1:
        integral = integral[:, ::step, ::step]
    return integral[:, :canvas_size, :canvas_size]


def unlabeled_losses(model, student_params, teacher_params, batch, rng, mt: MTConfig, targets=None):
    """Teacher pseudo-labeling + student consistency losses for one
    unlabeled K-aug batch.

    batch: {"t_images": [B, K, H, W, 3], "s_images": [B, S, H, W, 3],
            "image_size": [B, 2]}.
    targets: optional GroundTruth (with masks) — the PLTRAIN branch
    (generalized_rcnn.py:133-138): the teacher skips its own inference
    and uses the given labels as the consistency targets.
    """
    c = model.config
    t_images = batch["t_images"]
    s_images = batch["s_images"]
    sizes = batch["image_size"]
    tvars = {"params": teacher_params}
    svars = {"params": student_params}

    use_mgd = mt.fg_hint > 0 and model.config.with_hint_adaptor
    use_psm = mt.cls_loss_weight > 0
    canvas_size = c.image_size // mt.mgd_canvas_stride

    # ---- teacher (no grad) ---------------------------------------------
    # 2K teacher feature pyramids: each aug view and its flip, batched as
    # one [2K*B] backbone pass (bigger convs ride the MXU better than 2K
    # sequential B-sized passes — SURVEY §7 stage 7). Computed FIRST so
    # the pseudo-labeling inference below reuses the view-0 pyramid
    # instead of paying a second backbone+RPN pass over the same pixels.
    bsz = t_images.shape[0]
    view_imgs = []
    for k in range(mt.aug_k):
        img = t_images[:, k]
        view_imgs.append(img)
        view_imgs.append(hflip_image(img))
    stacked = jnp.concatenate(view_imgs, axis=0)  # [2K*B, H, W, 3]
    feats_all = model.apply(tvars, stacked, method=model.backbone_features)
    n_views = 2 * mt.aug_k
    t_feats = [
        tuple(f[v * bsz : (v + 1) * bsz] for f in feats_all) for v in range(n_views)
    ]

    if targets is not None:
        pseudo = GroundTruth(boxes=targets.boxes, labels=targets.labels, valid=targets.valid)
        dets = None
        integral = (
            gt_integral_canvas(targets.masks, targets.valid, canvas_size) if use_mgd else None
        )
    else:
        dets = model.apply(
            tvars, t_feats[0], sizes, t_images[:, 0],
            method=model.detections_from_features,
        )
        dets = jax.lax.stop_gradient(dets)
        pseudo = GroundTruth(boxes=dets.boxes, labels=dets.labels, valid=dets.valid)

        integral = None
        if use_mgd:
            integral = jax.vmap(
                lambda m, b, v: paste_integral(m, b, v, canvas_size, float(mt.mgd_canvas_stride))
            )(dets.masks, dets.boxes, dets.valid)  # [B, Hc, Wc]
    t_embs = None
    if use_mgd:
        embs_all = model.apply(tvars, feats_all, method=model.hint_embeddings)
        t_embs = [
            tuple(e[v * bsz : (v + 1) * bsz] for e in embs_all) for v in range(n_views)
        ]

    # proposals from view-0 features against pseudo gt, then subsample
    proposals = model.apply(
        tvars, t_feats[0], sizes, pseudo, method=model.teacher_proposals
    )
    from ..models.box_head import subsample_proposals

    rng, r_sub = jax.random.split(rng)
    rois = subsample_proposals(
        r_sub,
        proposals,
        pseudo,
        batch_size_per_image=c.box_batch_per_image,
        positive_fraction=c.box_positive_fraction,
        fg_thresh=c.box_fg_iou,
        bg_thresh=c.box_bg_iou,
        reg_weights=c.reg_weights,
    )
    rois_boxes = jax.lax.stop_gradient(rois.boxes)
    flipped_boxes = hflip_boxes(rois_boxes, c.image_size)

    t_logits = []
    if use_psm:
        # one box-head pass over all 2K views: features and the
        # (flip-matched) RoIs stack on the leading axis
        boxes_all = jnp.concatenate(
            [flipped_boxes if v % 2 == 1 else rois_boxes for v in range(n_views)], axis=0
        )
        logits_all = model.apply(
            tvars, feats_all, boxes_all, True, method=model.box_predictions,
            roi_chunk=128,
        )[0]
        t_logits = [logits_all[v * bsz : (v + 1) * bsz] for v in range(n_views)]
        t_logits = jax.lax.stop_gradient(t_logits)
    if use_mgd:
        t_embs = jax.lax.stop_gradient(t_embs)

    # ---- student (grad) -------------------------------------------------
    # same batched-views treatment as the teacher
    n_s = s_images.shape[1]
    s_view_imgs = [
        hflip_image(s_images[:, si]) if si % 2 == 1 else s_images[:, si] for si in range(n_s)
    ]
    s_stacked = jnp.concatenate(s_view_imgs, axis=0)  # [S*B, H, W, 3]
    s_feats_all = model.apply(svars, s_stacked, method=model.backbone_features)
    s_feats = [tuple(f[si * bsz : (si + 1) * bsz] for f in s_feats_all) for si in range(n_s)]
    s_embs, s_logits = [], []
    if use_mgd:
        s_embs_all = model.apply(svars, s_feats_all, method=model.hint_embeddings)
        s_embs = [tuple(e[si * bsz : (si + 1) * bsz] for e in s_embs_all) for si in range(n_s)]
    if use_psm:
        s_boxes_all = jnp.concatenate(
            [flipped_boxes if si % 2 == 1 else rois_boxes for si in range(n_s)], axis=0
        )
        rng, r_do = jax.random.split(rng)
        s_logits_all = model.apply(
            svars, s_feats_all, s_boxes_all, False, method=model.box_predictions,
            rngs={"dropout": r_do}, roi_chunk=128,
        )[0]
        s_logits = [s_logits_all[si * bsz : (si + 1) * bsz] for si in range(n_s)]

    losses = {}
    if mt.odkd and use_psm:
        # ODKD takes precedence over PSM (generalized_rcnn.py:193-196,
        # box_head.py:104-110): single-view soft distillation
        losses["mt_classifier"] = odkd_loss(
            s_logits[0], t_logits[0], rois.labels, rois.valid, mt.cls_balance_weight
        )
    elif use_psm:
        losses["mt_classifier"] = psm_loss(
            s_logits, t_logits, rois.labels, rois.valid, mt, c.num_classes
        )
    if use_mgd:
        losses["mt_fg_loss"] = mgd_loss(t_embs, s_embs, integral, mt)
    if (mt.ffi or mt.odkd) and model.config.with_hint_adaptor:
        t_emb0 = model.apply(tvars, t_feats[0], method=model.hint_embeddings)
        s_emb0 = model.apply(svars, s_feats[0], method=model.hint_embeddings)
        if mt.ffi:
            canvas = jax.vmap(
                lambda bx, v: boxes_to_canvas(bx, v, canvas_size, float(mt.mgd_canvas_stride))
            )(pseudo.boxes, pseudo.valid)
            losses["mt_hint_loss"] = ffi_hint_loss(t_emb0, s_emb0, canvas)
        else:
            losses["mt_hint_loss"] = naive_hint_loss(t_emb0, s_emb0)
    return losses


# ---------------------------------------------------------------- train step
def make_mt_step(model, tx, mt: MTConfig):
    """Full MMT-PSM step: supervised + unlabeled consistency + EMA.

    Use for iterations > START_MT (the host loop runs the supervised
    step before that, mirroring MTtrainer.py:177-179).
    """

    def step_fn(state: TrainState, labeled_batch, unlabeled_batch, rng):
        gt = batch_to_gt(labeled_batch)
        rng = jax.random.fold_in(rng, state.step)
        r_sample, r_drop, r_unlabeled = jax.random.split(rng, 3)

        def loss_fn(p):
            sup = model.apply(
                {"params": p},
                labeled_batch["image"],
                labeled_batch["image_size"],
                gt,
                train=True,
                rngs={"sample": r_sample, "dropout": r_drop},
            )
            # PLTRAIN: consistency batches that carry GT feed the teacher
            # directly (generalized_rcnn.py:133-138)
            u_targets = (
                batch_to_gt(unlabeled_batch)
                if mt.pltrain and "boxes" in unlabeled_batch
                else None
            )
            mt_losses = unlabeled_losses(
                model, p, state.teacher_params, unlabeled_batch, r_unlabeled, mt,
                targets=u_targets,
            )
            all_losses = {**sup, **mt_losses}
            weighted = weight_sum_losses(all_losses, state.step, mt)
            return sum(weighted.values()), all_losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # EMA from START_MT-10 (MTtrainer.py:195-196)
        do_ema = state.step > (mt.start_mt - 10)
        ema_iter = jnp.maximum(state.step - (mt.start_mt - 10), 0)
        ema_params = ema_update(state.teacher_params, params, ema_iter, mt.alpha)
        teacher = jax.tree_util.tree_map(
            lambda t_new, t_old: jnp.where(do_ema, t_new, t_old), ema_params, state.teacher_params
        )

        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1, teacher_params=teacher
        )
        metrics = dict(losses)
        metrics["loss_total"] = total
        metrics["mt_weight"] = mt_loss_weight(state.step, mt)
        return new_state, metrics

    return step_fn
