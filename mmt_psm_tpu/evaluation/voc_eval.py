"""Pascal VOC detection evaluation (chainercv-style).

Port of the reference VOC evaluator (reference:
maskrcnn_benchmark/data/datasets/evaluation/voc/voc_eval.py:49-217),
with its quirks preserved:

* boxes go through the integer VOC convention — +1 added to x2/y2
  before an IoU that itself uses the +1 TO_REMOVE area convention
  (voc_eval.py:108-117);
* per prediction the argmax gt is taken, a second match to the same gt
  counts as a false positive even above the IoU threshold, and matches
  to ``difficult`` gt are ignored entirely (voc_eval.py:118-136);
* AP uses the 11-point 2007 metric by default at the entry point
  (do_voc_evaluation passes use_07_metric=True, voc_eval.py:28-33).

Predictions/ground truths are struct-of-array dicts:
  pred: {"boxes" [N,4] xyxy, "labels" [N], "scores" [N]}
  gt:   {"boxes" [M,4], "labels" [M], "difficult" [M] (optional)}
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np


def _voc_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU with the +1 area convention (boxlist_ops.py:57-92)."""
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def calc_detection_voc_prec_rec(gt_list, pred_list, iou_thresh: float = 0.5):
    """Per-class precision/recall curves (voc_eval.py:70-160)."""
    n_pos = defaultdict(int)
    score = defaultdict(list)
    match = defaultdict(list)
    for gt, pred in zip(gt_list, pred_list):
        pred_bbox = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)
        pred_label = np.asarray(pred["labels"], np.int64).reshape(-1)
        pred_score = np.asarray(pred["scores"], np.float64).reshape(-1)
        gt_bbox = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)
        gt_label = np.asarray(gt["labels"], np.int64).reshape(-1)
        gt_difficult = np.asarray(
            gt.get("difficult", np.zeros(len(gt_bbox), bool)), bool
        ).reshape(-1)

        for l in np.unique(np.concatenate((pred_label, gt_label)).astype(int)):
            pred_mask_l = pred_label == l
            pred_bbox_l = pred_bbox[pred_mask_l]
            pred_score_l = pred_score[pred_mask_l]
            order = pred_score_l.argsort()[::-1]
            pred_bbox_l = pred_bbox_l[order]
            pred_score_l = pred_score_l[order]

            gt_mask_l = gt_label == l
            gt_bbox_l = gt_bbox[gt_mask_l]
            gt_difficult_l = gt_difficult[gt_mask_l]

            n_pos[l] += int(np.logical_not(gt_difficult_l).sum())
            score[l].extend(pred_score_l)

            if len(pred_bbox_l) == 0:
                continue
            if len(gt_bbox_l) == 0:
                match[l].extend((0,) * pred_bbox_l.shape[0])
                continue

            # integer box convention (voc_eval.py:108-112)
            pred_bbox_l = pred_bbox_l.copy()
            pred_bbox_l[:, 2:] += 1
            gt_bbox_l = gt_bbox_l.copy()
            gt_bbox_l[:, 2:] += 1
            iou = _voc_iou(pred_bbox_l, gt_bbox_l)
            gt_index = iou.argmax(axis=1)
            gt_index[iou.max(axis=1) < iou_thresh] = -1

            selec = np.zeros(gt_bbox_l.shape[0], bool)
            for gt_idx in gt_index:
                if gt_idx >= 0:
                    if gt_difficult_l[gt_idx]:
                        match[l].append(-1)
                    else:
                        match[l].append(1 if not selec[gt_idx] else 0)
                    selec[gt_idx] = True
                else:
                    match[l].append(0)

    n_fg_class = max(n_pos.keys()) + 1
    prec = [None] * n_fg_class
    rec = [None] * n_fg_class
    for l in n_pos.keys():
        score_l = np.array(score[l])
        match_l = np.array(match[l], np.int8)
        order = score_l.argsort()[::-1]
        match_l = match_l[order]
        tp = np.cumsum(match_l == 1)
        fp = np.cumsum(match_l == 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            prec[l] = tp / (fp + tp)
        if n_pos[l] > 0:
            rec[l] = tp / n_pos[l]
    return prec, rec


def calc_detection_voc_ap(prec, rec, use_07_metric: bool = False) -> np.ndarray:
    """AP per class from PR curves (voc_eval.py:163-217)."""
    n_fg_class = len(prec)
    ap = np.empty(n_fg_class)
    for l in range(n_fg_class):
        if prec[l] is None or rec[l] is None:
            ap[l] = np.nan
            continue
        if use_07_metric:
            ap[l] = 0.0
            for t in np.arange(0.0, 1.1, 0.1):
                if np.sum(rec[l] >= t) == 0:
                    p = 0.0
                else:
                    p = np.max(np.nan_to_num(prec[l])[rec[l] >= t])
                ap[l] += p / 11
        else:
            mpre = np.concatenate(([0], np.nan_to_num(prec[l]), [0]))
            mrec = np.concatenate(([0], rec[l], [1]))
            mpre = np.maximum.accumulate(mpre[::-1])[::-1]
            i = np.where(mrec[1:] != mrec[:-1])[0]
            ap[l] = np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1])
    return ap


def eval_detection_voc(pred_list, gt_list, iou_thresh: float = 0.5, use_07_metric: bool = False) -> dict:
    """Full evaluation: {"ap": per-class array, "map": mean over valid}."""
    assert len(gt_list) == len(pred_list), "gt and pred list lengths differ"
    prec, rec = calc_detection_voc_prec_rec(gt_list, pred_list, iou_thresh)
    ap = calc_detection_voc_ap(prec, rec, use_07_metric=use_07_metric)
    return {"ap": ap, "map": float(np.nanmean(ap))}


def do_voc_evaluation(dataset, predictions, output_folder: str | None = None, logger=None) -> dict:
    """Entry point matching the reference (voc_eval.py:12-46): evaluates
    ``predictions[i]`` (pred dict, image-resolution boxes) against
    ``dataset.get_groundtruth(i)`` with the 2007 11-point metric, writes
    result.txt."""
    pred_list, gt_list = [], []
    for image_id, prediction in enumerate(predictions):
        if prediction is None or len(prediction["boxes"]) == 0:
            continue
        pred_list.append(prediction)
        gt_list.append(dataset.get_groundtruth(image_id))
    result = eval_detection_voc(pred_list, gt_list, iou_thresh=0.5, use_07_metric=True)
    result_str = "mAP: {:.4f}\n".format(result["map"])
    for i, ap in enumerate(result["ap"]):
        if i == 0:
            continue
        result_str += "{:<16}: {:.4f}\n".format(dataset.map_class_id_to_class_name(i), ap)
    if logger is not None:
        logger.info(result_str)
    if output_folder:
        with open(os.path.join(output_folder, "result.txt"), "w") as fid:
            fid.write(result_str)
    return result
