"""Dataset-type evaluation dispatcher.

Parity with the reference's isinstance dispatch (reference:
maskrcnn_benchmark/data/datasets/evaluation/__init__.py:7-32):
COCODataset -> COCO-style AP, PascalVOCDataset -> VOC 11-point mAP,
Pap datasets -> the Papeval stack. ``predictions[i]`` is the per-image
struct-of-arrays dict emitted by the inference engine:
{"boxes" [K,4], "scores" [K], "labels" [K], "valid" [K],
 "masks" [K,R,R] probs (optional), "image_hw" (h, w)}.
"""

from __future__ import annotations

import numpy as np


def _per_cat(prediction, sample, categories):
    """One image's prediction + dataset sample -> (dt_by_cat, gt_by_cat)."""
    from ..engine.inference import detections_to_instseg, gt_to_instseg

    h, w = prediction["image_hw"]
    masks = prediction.get("masks")
    if masks is None:
        # box-only: fabricate box-filled mask probs at 1x1 so the shared
        # InstSeg conversion applies
        masks = np.ones((len(prediction["boxes"]), 1, 1), np.float32)
    dt = detections_to_instseg(
        np.asarray(prediction["boxes"]),
        np.asarray(prediction["scores"]),
        np.asarray(prediction["labels"]),
        np.asarray(prediction["valid"]),
        np.asarray(masks),
        (h, w),
    )
    gt = gt_to_instseg(
        np.asarray(sample["boxes"]),
        np.asarray(sample["labels"]),
        np.ones(len(sample["boxes"]), bool),
        np.asarray(sample["masks"]),
    )
    return dt, gt


def evaluate(dataset, predictions, output_folder: str | None = None, iou_type: str = "segm", **kwargs):
    """Evaluate ``predictions`` (one entry per dataset item) with the
    evaluator matching the dataset type."""
    from ..data.coco import COCODataset
    from ..data.concat import ConcatDataset
    from ..data.pap import PapDataset, PapUnlabeledDataset
    from ..data.voc import PascalVOCDataset

    if isinstance(dataset, ConcatDataset):
        dataset = dataset.datasets[0] if len(dataset.datasets) == 1 else dataset

    if isinstance(dataset, PascalVOCDataset):
        from .voc_eval import do_voc_evaluation

        preds = []
        for p in predictions:
            if p is None:
                preds.append({"boxes": np.zeros((0, 4)), "labels": np.zeros(0, np.int64), "scores": np.zeros(0)})
                continue
            v = np.asarray(p["valid"], bool)
            preds.append(
                {
                    "boxes": np.asarray(p["boxes"])[v],
                    "labels": np.asarray(p["labels"])[v],
                    "scores": np.asarray(p["scores"])[v],
                }
            )
        return do_voc_evaluation(dataset, preds, output_folder, kwargs.get("logger"))

    if isinstance(dataset, COCODataset):
        from .coco_eval import CocoEvaluator

        cats = sorted(dataset.json_category_id_to_contiguous_id.values())
        ev = CocoEvaluator(categories=cats, iou_type=iou_type, max_dets=kwargs.get("max_dets", 100))
        for i, p in enumerate(predictions):
            if p is None:
                continue
            dt, gt = _per_cat(p, dataset[i], cats)
            if iou_type == "segm":
                dt = {c: {"boxes": s.boxes, "scores": s.scores, "masks": s} for c, s in dt.items()}
                gt = {c: {"boxes": s.boxes, "masks": s} for c, s in gt.items()}
            else:
                dt = {c: {"boxes": s.boxes, "scores": s.scores} for c, s in dt.items()}
                gt = {c: {"boxes": s.boxes} for c, s in gt.items()}
            ev.add_image(dt, gt)
        return ev.summarize()

    if isinstance(dataset, (PapDataset, PapUnlabeledDataset)):
        from .pap_eval import PapEvaluator

        ev = PapEvaluator(categories=kwargs.get("categories", (1, 2)), max_dets=kwargs.get("max_dets", 200))
        for i, p in enumerate(predictions):
            if p is None:
                continue
            dt, gt = _per_cat(p, dataset[i], ev.categories)
            ev.add_image(dt, gt)
        return ev.summarize()

    raise NotImplementedError(f"Unsupported dataset type {dataset.__class__.__name__}.")
