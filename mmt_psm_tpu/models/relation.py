"""IR-Net relation-NMS: learned duplicate removal.

Fixed-shape port of the reference DuplicationRemovalNetwork + attention
RelationModule (reference: maskrcnn_benchmark/modeling/relation/
relation_module.py:13-601):

* top FIRST_N proposals per fg class by score, boxes decoded per class
  and clipped (filter_results :503-590);
* sinusoidal rank embedding (:604-624) added to a 128-d appearance
  embedding;
* multi-head (16-group) attention with geometric gate
  log(relu(WG(pos))) + qk/sqrt(d) (+ log iou), top-K sparse softmax
  (:33-90), grouped 1x1 output conv;
* per-threshold classifier; training target = per-gt best-scoring box
  (prepare_label :404-461) or its IoU (prepare_reg_label :323-401,
  REG_IOU mode -> MSE loss :204-216);
* test: score merge (:592-601), per-class fg threshold + greedy NMS
  (0.5 for nuclei, POS_NMS for cytoplasm :241-306), global cap.

The reference's numpy/nonzero label prep is reformulated as masked
argmax/one-hot ops so the whole head jits.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import box_coder as bc
from ..ops.nms import nms_topk
from ..structures.boxes import box_iou, clip_to_image
from ..structures.detections import Detections


# --------------------------------------------------------------- embeddings
def rank_embedding(rank_dim: int, feat_dim: int, wave_length: float = 1000.0):
    """Sinusoidal rank embedding [rank_dim, feat_dim] (:604-624)."""
    rank = jnp.arange(rank_dim, dtype=jnp.float32)[:, None]
    feat = jnp.arange(feat_dim // 2, dtype=jnp.float32)
    dim_mat = 1.0 / (wave_length ** (feat / (feat_dim / 2)))
    mul = rank * dim_mat[None, :]
    return jnp.concatenate([jnp.sin(mul), jnp.cos(mul)], axis=-1)


def position_matrix_embedding(boxes, dim_g: int, wave_len: float = 1000.0):
    """Pairwise geometric embedding [C, N, N, dim_g] (:626-682).

    boxes: [N, C, 4].
    """
    b = boxes.transpose(1, 0, 2)  # [C, N, 4]
    x_min, y_min, x_max, y_max = jnp.split(b, 4, axis=2)
    cx = (x_min + x_max) * 0.5  # [C, N, 1]
    cy = (y_min + y_max) * 0.5
    w = (x_max - x_min) + 1.0
    h = (y_max - y_min) + 1.0

    def rel(delta, denom):
        d = jnp.clip(jnp.abs(delta / denom), 1e-3)
        return jnp.log(d)

    delta_x = rel(cx - cx.transpose(0, 2, 1), w)
    delta_y = rel(cy - cy.transpose(0, 2, 1), h)
    delta_w = jnp.log(w / w.transpose(0, 2, 1))
    delta_h = jnp.log(h / h.transpose(0, 2, 1))
    pos = jnp.stack([delta_x, delta_y, delta_w, delta_h], axis=-1)  # [C,N,N,4]

    dev = 8
    feat = jnp.arange(dim_g / dev, dtype=jnp.float32)
    dim_mat = 1.0 / (wave_len ** (feat / (dim_g / dev)))
    mul = 100.0 * pos[..., None] * dim_mat  # [C,N,N,4,dim_g/8]
    mul = mul.reshape(*pos.shape[:3], -1)
    return jnp.concatenate([jnp.sin(mul), jnp.cos(mul)], axis=-1)


class RelationAttention(nn.Module):
    """Multi-head attention over proposals (:13-90)."""

    appearance_dim: int = 128
    geo_dim: int = 64
    group: int = 16
    dim: tuple = (1024, 1024, 128)
    topk: int = 40

    @nn.compact
    def __call__(self, f_a, pos_emb, valid):
        """f_a: [N, C, D]; pos_emb: [C, N, N, geo]; valid: [N, C] bool.

        Returns [N, C, dim[2]].
        """
        n, c, d = f_a.shape
        g = self.group
        dg0, dg1 = self.dim[0] // g, self.dim[1] // g

        w_g = nn.relu(nn.Dense(g, name="WG")(pos_emb))  # [C, N, N, G]
        fa_c = f_a.transpose(1, 0, 2)  # [C, N, D]
        w_k = nn.Dense(self.dim[1], name="WK")(fa_c).reshape(c, n, g, dg1)
        w_q = nn.Dense(self.dim[0], name="WQ")(fa_c).reshape(c, n, g, dg0)
        aff = jnp.einsum("cngd,cmgd->cgnm", w_q, w_k) / jnp.sqrt(float(dg1))

        w_g = w_g.transpose(0, 3, 1, 2)  # [C, G, N, N]
        w_mn = jnp.log(jnp.clip(w_g, 1e-6)) + aff

        # mask invalid keys so they never receive attention
        key_valid = valid.transpose(1, 0)[:, None, None, :]  # [C,1,1,N]
        w_mn = jnp.where(key_valid, w_mn, -1e30)

        k = min(n, self.topk)
        top_vals, top_idx = jax.lax.top_k(w_mn, k)  # [C,G,N,k]
        soft = jax.nn.softmax(top_vals, axis=-1)
        # scatter the top-k softmax back into a sparse [N, N] attention
        attn = jnp.zeros_like(w_mn).at[
            jnp.arange(c)[:, None, None, None],
            jnp.arange(g)[None, :, None, None],
            jnp.arange(n)[None, None, :, None],
            top_idx,
        ].set(soft)

        out = jnp.einsum("cgnm,cmd->cgnd", attn, fa_c)  # [C, G, N, D]
        # grouped 1x1 conv: group g's D channels -> dim2/G channels
        out = out.transpose(2, 0, 1, 3).reshape(1, n, c, g * d)  # [1,N,C,G*D]
        out = nn.Conv(
            self.dim[2], (1, 1), feature_group_count=self.group, name="conv1"
        )(out)[0]  # [N, C, dim2]
        return out


# ------------------------------------------------------------------- labels
def prepare_nms_labels(sorted_boxes, sorted_scores, gt_boxes, gt_labels, gt_valid, threshs, reg_iou: bool):
    """Per-class relation-NMS training labels (:323-461).

    sorted_boxes [N, C, 4], sorted_scores [N, C]; returns [N, C, T].
    For each gt and threshold, the highest-scoring box among those whose
    best-iou gt is this gt and iou > thresh gets label 1 (or its IoU in
    REG_IOU mode).
    """
    n, c_fg = sorted_scores.shape
    outs = []
    for ci in range(c_fg):
        boxes = sorted_boxes[:, ci, :]
        score = sorted_scores[:, ci]
        is_cls = gt_valid & (gt_labels == ci + 1)
        iou = box_iou(boxes, gt_boxes)  # [N, M]
        iou = jnp.where(is_cls[None, :], iou, 0.0)
        best_gt = jnp.argmax(iou, axis=1)  # [N]
        eye = jax.nn.one_hot(best_gt, gt_boxes.shape[0])  # [N, M]
        has_gt = jnp.any(is_cls)
        per_t = []
        for t in threshs:
            overlap = (iou > t) & is_cls[None, :]
            overlap_score = score[:, None] * overlap * eye  # [N, M]
            max_score_dt = jnp.argmax(overlap_score, axis=0)  # [M]
            valid_dt = jnp.any(overlap, axis=1)  # [N]
            hits = jnp.zeros((n,), jnp.int32).at[max_score_dt].add(
                is_cls.astype(jnp.int32), mode="drop"
            )
            chosen = (hits > 0) & valid_dt
            if reg_iou:
                overlap_iou = iou * overlap * eye
                val_per_gt = overlap_iou[max_score_dt, jnp.arange(gt_boxes.shape[0])]
                vals = jnp.zeros((n,)).at[max_score_dt].max(jnp.where(is_cls, val_per_gt, 0.0), mode="drop")
                per_t.append(jnp.where(chosen, vals, 0.0) * has_gt)
            else:
                per_t.append(chosen.astype(jnp.float32) * has_gt)
        outs.append(jnp.stack(per_t, axis=-1))  # [N, T]
    return jnp.stack(outs, axis=1)  # [N, C, T]


# --------------------------------------------------------------- the module
@dataclasses.dataclass(frozen=True)
class RelationNMSConfig:
    first_n: int = 90
    threshs: tuple = (0.1,)
    roi_feat_dim: int = 1024
    appearance_dim: int = 128
    geo_dim: int = 64
    group: int = 16
    hid_dim: tuple = (1024, 1024, 128)
    topk: int = 40
    reg_iou: bool = True
    fg_thread: float = 0.1
    merge_method: int = 0
    pos_nms: float = 0.55
    nms_thresh: float = 0.5
    detections_per_img: int = 200
    num_classes: int = 3
    reg_weights: tuple = (10.0, 10.0, 5.0, 5.0)

    @classmethod
    def from_cfg(cls, cfg):
        r = cfg.MODEL.RELATION_NMS
        return cls(
            first_n=r.FIRST_N,
            threshs=tuple(r.THREAD),
            roi_feat_dim=r.ROI_FEAT_DIM,
            appearance_dim=r.APPEARANCE_FEAT_DIM,
            geo_dim=r.GEO_FEAT_DIM,
            group=r.GROUP,
            hid_dim=tuple(r.HID_DIM),
            topk=r.TOPK,
            reg_iou=r.REG_IOU,
            fg_thread=r.FG_THREAD,
            merge_method=r.MERGE_METHOD,
            pos_nms=r.POS_NMS,
            detections_per_img=cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG,
            num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            reg_weights=tuple(cfg.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS),
        )


class RelationNMS(nn.Module):
    """Learned NMS head. Runs per image (vmapped by the caller)."""

    config: RelationNMSConfig

    @nn.compact
    def __call__(self, appearance, probs, box_regression, prop_boxes, prop_valid, image_hw):
        """appearance: [S, roi_feat_dim] (box head fc7 features);
        probs: [S, C] softmaxed class scores; box_regression: [S, 4C];
        prop_boxes: [S, 4]; prop_valid: [S].

        Returns dict with sorted tensors + classifier outputs; loss /
        inference assembly happens in the helpers below.
        """
        c = self.config
        c_fg = c.num_classes - 1
        decoded = bc.decode(
            box_regression.astype(jnp.float32), prop_boxes, c.reg_weights
        ).reshape(-1, c.num_classes, 4)

        fg_scores = jnp.where(prop_valid[:, None], probs[:, 1:], -1.0)  # [S, C-1]
        n = min(c.first_n, fg_scores.shape[0])
        sorted_scores, idx = jax.lax.top_k(fg_scores.T, n)  # [C-1, N]
        sorted_scores = sorted_scores.T  # [N, C-1]
        idx = idx.T  # [N, C-1]
        sorted_valid = sorted_scores > -0.5

        # per-class boxes for the sorted entries (class_agnostic=False picks
        # the class's own regression (:555-567))
        boxes_cls = decoded[:, 1:, :]  # [S, C-1, 4]
        sorted_boxes = jnp.take_along_axis(boxes_cls, idx[:, :, None], axis=0)  # [N, C-1, 4]
        sorted_boxes = clip_to_image(sorted_boxes, image_hw[0], image_hw[1])

        feat = nn.Dense(c.appearance_dim, name="roi_feat_embedding_fc")(
            appearance.astype(jnp.float32)
        )  # [S, 128]
        sorted_feat = feat[idx]  # [N, C-1, 128]
        rank = rank_embedding(n, c.roi_feat_dim)
        rank = nn.Dense(c.appearance_dim, name="nms_rank_fc")(rank)  # [N, 128]
        sorted_feat = sorted_feat + rank[:, None, :]

        pos_emb = position_matrix_embedding(sorted_boxes, c.geo_dim)
        attn = RelationAttention(
            appearance_dim=c.appearance_dim,
            geo_dim=c.geo_dim,
            group=c.group,
            dim=(c.hid_dim[0], c.hid_dim[1], c.appearance_dim),
            topk=c.topk,
            name="relation_module",
        )(sorted_feat, pos_emb, sorted_valid)
        feat_out = nn.relu(sorted_feat + attn)
        logits = nn.Dense(len(c.threshs), name="classifier")(feat_out)  # [N, C-1, T]
        if not c.reg_iou:
            logits = jax.nn.sigmoid(logits)

        return {
            "logits": logits,  # [N, C-1, T] (sigmoid'd unless reg_iou)
            "sorted_boxes": sorted_boxes,
            "sorted_scores": sorted_scores,
            "sorted_valid": sorted_valid,
            "sorted_idx": idx,
        }


def relation_nms_loss(out, gt_boxes, gt_labels, gt_valid, cfg: RelationNMSConfig):
    """Training loss for one image (:204-227)."""
    labels = prepare_nms_labels(
        out["sorted_boxes"],
        out["sorted_scores"],
        gt_boxes,
        gt_labels,
        gt_valid,
        cfg.threshs,
        cfg.reg_iou,
    )
    valid = out["sorted_valid"][:, :, None].astype(jnp.float32)
    if cfg.reg_iou:
        diff = (labels - out["logits"]) ** 2
        return jnp.sum(diff * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    scores = out["sorted_scores"][:, :, None]
    p = jnp.clip(scores * out["logits"], 1e-6, 1 - 1e-6)
    bce = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    return jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def relation_nms_inference(out, cfg: RelationNMSConfig) -> tuple:
    """Test-time duplicate removal for one image (:228-321).

    Returns (boxes [K,4], scores [K], labels [K], valid [K]).
    """
    logits = out["logits"]
    scores_in = out["sorted_scores"][:, :, None] * jnp.ones_like(logits)
    if cfg.reg_iou:
        scores = logits * (scores_in > cfg.fg_thread)
    else:
        scores = logits * scores_in
    # merge multi-threshold scores (:592-601)
    if cfg.merge_method == -1:
        merged = jnp.mean(scores, -1)
    elif cfg.merge_method == -2:
        merged = jnp.max(scores, -1)
    else:
        tidx = min(max(cfg.merge_method, 0), len(cfg.threshs) - 1)
        merged = scores[:, :, tidx]  # [N, C-1]

    c_fg = merged.shape[1]
    k_cap = cfg.detections_per_img
    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    for ci in range(c_fg):
        s = merged[:, ci]
        b = out["sorted_boxes"][:, ci, :]
        v = out["sorted_valid"][:, ci] & (s >= cfg.fg_thread)
        # nuclei (label 2) always NMS 0.5; cytoplasm (label 1) POS_NMS
        thresh = cfg.nms_thresh if ci == 1 else (cfg.pos_nms if cfg.pos_nms > 0 else None)
        if thresh is not None:
            kidx, kval = nms_topk(b, s, v, thresh, min(k_cap, b.shape[0]))
            all_boxes.append(b[kidx])
            all_scores.append(jnp.where(kval, s[kidx], 0.0))
            all_labels.append(jnp.full(kidx.shape, ci + 1, jnp.int32))
            all_valid.append(kval)
        else:
            all_boxes.append(b)
            all_scores.append(jnp.where(v, s, 0.0))
            all_labels.append(jnp.full(s.shape, ci + 1, jnp.int32))
            all_valid.append(v)
    boxes = jnp.concatenate(all_boxes, 0)
    scores = jnp.concatenate(all_scores, 0)
    labels = jnp.concatenate(all_labels, 0)
    valid = jnp.concatenate(all_valid, 0)

    masked = jnp.where(valid, scores, -1e30)
    top_scores, top_idx = jax.lax.top_k(masked, min(k_cap, masked.shape[0]))
    keep = top_scores > -1e29
    return boxes[top_idx], jnp.where(keep, top_scores, 0.0), jnp.where(keep, labels[top_idx], 0), keep
