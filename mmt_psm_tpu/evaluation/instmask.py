"""Instance-mask representation and pairwise IoU/intersection/union.

The reference computes mask overlap stats through a patched pycocotools
C extension whose ``iouIntUni`` returns (iou, intersection, union)
triples per (dt, gt) pair (reference: pycoco/_mask.pyx:318-397,
pycoco/maskApi.c:239-260 rleIouInterUnion) — the AJI metric needs the
raw I/U sums. Here masks are stored box-cropped (bbox + local boolean
array) and pair stats are computed exactly on the bbox intersection
window, which is algebraically identical to the RLE computation on
full frames but O(overlap area) instead of O(image area).

Everything is host-side numpy (eval is off the device hot path).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np


@dataclass
class InstSeg:
    """A set of instance masks. boxes are integer xyxy (inclusive), each
    mask is the box-local boolean array of shape (y2-y1+1, x2-x1+1)."""

    boxes: np.ndarray  # i64 [N, 4]
    masks: List[np.ndarray]  # N box-local bool arrays
    scores: np.ndarray | None = None  # f32 [N]
    areas: np.ndarray = field(init=False)

    def __post_init__(self):
        self.boxes = np.asarray(self.boxes, np.int64).reshape(-1, 4)
        self.areas = np.array([m.sum() for m in self.masks], np.float64)
        if self.scores is not None:
            self.scores = np.asarray(self.scores, np.float64)

    def __len__(self):
        return len(self.masks)

    @classmethod
    def from_full_masks(cls, full_masks, scores=None):
        """Build from full-frame boolean masks [N, H, W]."""
        boxes, local = [], []
        keep_scores = []
        for i, m in enumerate(full_masks):
            ys, xs = np.nonzero(m)
            if len(ys) == 0:
                boxes.append([0, 0, 0, 0])
                local.append(np.zeros((1, 1), bool))
            else:
                y1, y2, x1, x2 = ys.min(), ys.max(), xs.min(), xs.max()
                boxes.append([x1, y1, x2, y2])
                local.append(np.ascontiguousarray(m[y1 : y2 + 1, x1 : x2 + 1]))
            if scores is not None:
                keep_scores.append(scores[i])
        return cls(
            boxes=np.asarray(boxes, np.int64),
            masks=local,
            scores=np.asarray(keep_scores, np.float64) if scores is not None else None,
        )

    def select(self, idx):
        return InstSeg(
            boxes=self.boxes[idx],
            masks=[self.masks[i] for i in idx],
            scores=self.scores[idx] if self.scores is not None else None,
        )


def _pair_intersection(box_a, mask_a, box_b, mask_b) -> float:
    x1 = max(box_a[0], box_b[0])
    y1 = max(box_a[1], box_b[1])
    x2 = min(box_a[2], box_b[2])
    y2 = min(box_a[3], box_b[3])
    if x2 < x1 or y2 < y1:
        return 0.0
    a = mask_a[y1 - box_a[1] : y2 - box_a[1] + 1, x1 - box_a[0] : x2 - box_a[0] + 1]
    b = mask_b[y1 - box_b[1] : y2 - box_b[1] + 1, x1 - box_b[0] : x2 - box_b[0] + 1]
    return float(np.count_nonzero(a & b))


def iou_int_uni(dt: InstSeg, gt: InstSeg):
    """(iou, intersection, union) matrices [D, G], float64.

    Same contract as the reference's maskUtils.iouIntUni
    (pycoco/_mask.pyx:318-397) for non-crowd gt. Uses the C++ kernel
    (csrc/papeval.cpp) when the toolchain is available, else numpy.
    """
    d, g = len(dt), len(gt)
    from . import _native

    if d and g and _native.available():
        inter = _native.pair_intersections(dt.masks, dt.boxes, gt.masks, gt.boxes).astype(np.float64)
    else:
        inter = np.zeros((d, g), np.float64)
        for i in range(d):
            for j in range(g):
                inter[i, j] = _pair_intersection(dt.boxes[i], dt.masks[i], gt.boxes[j], gt.masks[j])
    union = dt.areas[:, None] + gt.areas[None, :] - inter
    iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)
    return iou, inter, union
