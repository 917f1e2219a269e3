"""Segmentation format conversions: polygon <-> bitmask <-> RLE.

Host-side equivalents of the reference's conversion helpers (reference:
maskrcnn_benchmark/utils/miscellaneous.py:60-231 mask/polygon/bbox
conversions, structures/segmentation_mask.py:127-137 polygon
rasterization via pycocotools, tools/cityscapes/
instances2dict_with_polygons.py contour extraction). Torch-free; RLE
uses the repo's column-major codec (evaluation/_native.py, pycocotools
semantics).
"""

from __future__ import annotations

import numpy as np


def polys_to_mask(polys, height: int, width: int) -> np.ndarray:
    """COCO polygon list -> bool [H, W] (segmentation_mask.py:127-137)."""
    from ..data.coco import rasterize_polygons

    return rasterize_polygons(polys, height, width)


def mask_to_polygons(mask: np.ndarray) -> list:
    """bool/u8 [H, W] -> list of flat [x0, y0, x1, y1, ...] polygons
    (cv2 contour extraction, instances2dict_with_polygons.py:40-79)."""
    import cv2

    m = np.ascontiguousarray(mask, np.uint8)
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    polys = []
    for c in contours:
        c = c.reshape(-1, 2)
        if len(c) >= 3:
            polys.append(c.reshape(-1).astype(np.float64).tolist())
    return polys


def mask_to_rle(mask: np.ndarray) -> dict:
    """bool/u8 [H, W] -> uncompressed COCO RLE dict."""
    from ..evaluation._native import rle_encode

    h, w = mask.shape
    return {"size": [int(h), int(w)], "counts": [int(c) for c in rle_encode(mask)]}


def rle_to_mask(rle: dict) -> np.ndarray:
    """Uncompressed COCO RLE dict -> u8 [H, W]."""
    from ..evaluation._native import rle_decode

    h, w = rle["size"]
    return rle_decode(np.asarray(rle["counts"], np.int64), h, w)


def polys_to_boxes(polys_list) -> np.ndarray:
    """Per-instance polygon lists -> [N, 4] xyxy boxes
    (detectron segms/boxes util semantics used by the converter)."""
    boxes = np.zeros((len(polys_list), 4), np.float64)
    for i, polys in enumerate(polys_list):
        pts = np.concatenate([np.asarray(p, np.float64).reshape(-1, 2) for p in polys])
        boxes[i] = [pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()]
    return boxes


def instances_to_dict_with_polygons(instance_id_image: np.ndarray, id_to_name) -> dict:
    """Cityscapes instanceIds image -> {class_name: [{id, contours,
    pixelCount}, ...]} (instances2dict_with_polygons.py:26-64).

    Instance encoding: pixel value < 1000 is a pure class label (stuff);
    >= 1000 encodes class_id * 1000 + instance_index
    (convert_cityscapes_to_coco.py:94-98 getLabelID).
    """
    out = {}
    img = np.asarray(instance_id_image)
    for inst_id in np.unique(img):
        if inst_id < 1000:
            continue  # not an instance
        label_id = int(inst_id) // 1000
        name = id_to_name.get(label_id)
        if name is None:
            continue
        mask = img == inst_id
        out.setdefault(name, []).append(
            {
                "id": int(inst_id),
                "contours": mask_to_polygons(mask),
                "pixelCount": int(mask.sum()),
            }
        )
    return out
