"""Multiprocess eval worker: paste + per-image Papeval stats.

The host side of evaluation (Masker paste into image space + the
per-image AJI/F1/DSC/mAP bookkeeping) costs ~250 ms per 1000px image —
an order of magnitude more than device inference. The per-image work is
embarrassingly parallel (reference inference.py:16-41 runs it serially;
pap_eval.py:266 even carries a "todo parallel evaluate"), so
engine/inference.py farms it out to a spawn-based process pool running
this module. Deliberately jax-free: importing jax in a worker would try
to re-initialize the TPU client.
"""

from __future__ import annotations

import numpy as np

from ..evaluation.pap_eval import PapEvaluator
from .paste import detections_to_instseg


def ping() -> bool:
    """No-op used to force worker processes to boot eagerly (imports
    amortize against device inference instead of the first real task)."""
    return True


def eval_one(payload):
    """One image end-to-end: returns the list of ImageResult rows the
    main-process PapEvaluator would have appended.

    payload: (boxes, scores, labels, valid, masks f16, image_hw,
              gt_by_cat {cat: InstSeg} — converted in the main process so
              full-frame GT bitmasks never cross the process boundary,
              categories, max_dets, use_iou)
    """
    (
        boxes,
        scores,
        labels,
        valid,
        masks,
        image_hw,
        gt,
        categories,
        max_dets,
        use_iou,
    ) = payload
    dt = detections_to_instseg(
        boxes, scores, labels, valid, np.asarray(masks, np.float32), image_hw
    )
    ev = PapEvaluator(categories=categories, max_dets=max_dets, use_iou=use_iou)
    ev.add_image(dt, gt)
    return ev.results
