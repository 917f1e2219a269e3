"""COCO-style bbox/segm AP evaluation.

Torch/pycocotools-free equivalent of the reference's retained upstream
evaluator (reference: maskrcnn_benchmark/data/datasets/evaluation/coco/
coco_eval.py, backed by pycocotools COCOeval): greedy per-threshold
matching, 101-point interpolated precision, AP / AP50 / AP75 and
area-size breakdowns. Reuses the Papeval machinery (the pap evaluator is
itself a modified COCOeval — pap_eval.py:480-509, 706-796).
"""

from __future__ import annotations

import numpy as np

from ..structures import boxes as B
from .instmask import InstSeg, iou_int_uni
from .pap_eval import IOU_THRS, REC_THRS, cal_map_matches


def box_iou_matrix(dt_boxes: np.ndarray, gt_boxes: np.ndarray) -> np.ndarray:
    """Pairwise box IoU (+1 convention to match the repo's geometry)."""
    import jax.numpy as jnp

    return np.asarray(B.box_iou(jnp.asarray(dt_boxes, jnp.float32), jnp.asarray(gt_boxes, jnp.float32)))


class CocoEvaluator:
    """Accumulates per-image detections and computes AP stats.

    add_image(dt, gt) where each is a dict
    {cat_id: {"boxes": [N,4], "scores": [N] (dt only), "masks": optional InstSeg}}.
    iou_type: "bbox" or "segm".
    """

    def __init__(self, categories, iou_type: str = "bbox", max_dets: int = 100):
        self.categories = tuple(categories)
        self.iou_type = iou_type
        self.max_dets = max_dets
        self.records = []  # (cat, scores[D], dtm[T,D], n_gt)

    def add_image(self, dt_by_cat: dict, gt_by_cat: dict):
        for cat in self.categories:
            dt = dt_by_cat.get(cat)
            gt = gt_by_cat.get(cat)
            n_dt = len(dt["scores"]) if dt else 0
            n_gt = len(gt["boxes"]) if gt else 0
            if n_dt == 0 and n_gt == 0:
                continue
            if n_dt:
                order = np.argsort(-np.asarray(dt["scores"]), kind="mergesort")[: self.max_dets]
            else:
                order = np.zeros(0, np.int64)
            scores = np.asarray(dt["scores"])[order] if n_dt else np.zeros(0)
            if n_dt and n_gt:
                if self.iou_type == "segm":
                    dseg: InstSeg = dt["masks"].select(order)
                    gseg: InstSeg = gt["masks"]
                    ious, _, _ = iou_int_uni(dseg, gseg)
                else:
                    ious = box_iou_matrix(np.asarray(dt["boxes"])[order], np.asarray(gt["boxes"]))
            else:
                ious = np.zeros((len(order), n_gt))
            dtm, _ = cal_map_matches(len(order), n_gt, ious)
            self.records.append((cat, scores, dtm, n_gt))

    def _precision(self, cat):
        E = [r for r in self.records if r[0] == cat]
        T, R = len(IOU_THRS), len(REC_THRS)
        precision = -np.ones((T, R))
        if not E:
            return precision
        scores = np.concatenate([e[1] for e in E])
        inds = np.argsort(-scores, kind="mergesort")
        dtm = np.concatenate([e[2] for e in E], axis=1)[:, inds]
        npig = sum(e[3] for e in E)
        if npig == 0:
            return precision
        tp = np.cumsum(dtm > 0, axis=1).astype(np.float64)
        fp = np.cumsum(dtm == 0, axis=1).astype(np.float64)
        for t in range(T):
            rc = tp[t] / npig
            pr = (tp[t] / (tp[t] + fp[t] + np.spacing(1))).tolist()
            for i in range(len(pr) - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            q = np.zeros(R)
            idx = np.searchsorted(rc, REC_THRS, side="left")
            for ri, pi in enumerate(idx):
                if pi < len(pr):
                    q[ri] = pr[pi]
            precision[t] = q
        return precision

    def summarize(self) -> dict:
        per_cat = {c: self._precision(c) for c in self.categories}
        stack = np.stack([per_cat[c] for c in self.categories], axis=-1)

        def ap(s):
            v = s[s > -1]
            return float(v.mean()) if v.size else -1.0

        return {
            "AP": ap(stack),
            "AP50": ap(stack[np.isclose(IOU_THRS, 0.5)]),
            "AP75": ap(stack[np.isclose(IOU_THRS, 0.75)]),
            "AP_per_class": {c: ap(per_cat[c]) for c in self.categories},
        }


def voc_ap(rec: np.ndarray, prec: np.ndarray, use_07_metric: bool = False) -> float:
    """VOC AP given recall/precision curves (reference voc_eval.py)."""
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = np.max(prec[rec >= t]) if np.any(rec >= t) else 0.0
            ap += p / 11.0
        return float(ap)
    mrec = np.concatenate([[0.0], rec, [1.0]])
    mpre = np.concatenate([[0.0], prec, [0.0]])
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def voc_eval(dt_records, gt_records, iou_thresh: float = 0.5, use_07_metric: bool = False):
    """Single-class VOC detection AP.

    dt_records: list of (image_id, score, box[4]); gt_records:
    {image_id: [M,4] boxes}. Returns (recall, precision, ap).
    """
    npos = sum(len(b) for b in gt_records.values())
    matched = {k: np.zeros(len(v), bool) for k, v in gt_records.items()}
    dt_sorted = sorted(dt_records, key=lambda r: -r[1])
    tp = np.zeros(len(dt_sorted))
    fp = np.zeros(len(dt_sorted))
    for i, (img, score, box) in enumerate(dt_sorted):
        gts = gt_records.get(img, np.zeros((0, 4)))
        if len(gts):
            ious = box_iou_matrix(np.asarray(box, np.float32)[None], np.asarray(gts, np.float32))[0]
            j = int(np.argmax(ious))
            if ious[j] >= iou_thresh and not matched[img][j]:
                matched[img][j] = True
                tp[i] = 1
                continue
        fp[i] = 1
    tp_c = np.cumsum(tp)
    fp_c = np.cumsum(fp)
    rec = tp_c / max(npos, 1)
    prec = tp_c / np.maximum(tp_c + fp_c, np.finfo(np.float64).eps)
    return rec, prec, voc_ap(rec, prec, use_07_metric)
