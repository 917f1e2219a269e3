"""COCO-format dataset (json annotations + image files).

Equivalent of the reference's COCODataset (reference:
maskrcnn_benchmark/data/datasets/coco.py, kept for pretrain-compat) on
top of the CELL index: yields the same sample dict as PapDataset
(image, boxes, labels, full-frame instance masks) so the shared loaders
and evaluators apply unchanged. Polygon segmentations are rasterized
with PIL (the reference uses pycocotools frPyObjects).
"""

from __future__ import annotations

import os

import numpy as np

from .cell import CELL


def rasterize_polygons(polys, h: int, w: int) -> np.ndarray:
    """COCO polygon list -> bool mask [h, w]."""
    from PIL import Image, ImageDraw

    img = Image.new("1", (w, h), 0)
    draw = ImageDraw.Draw(img)
    for poly in polys:
        pts = [(poly[i], poly[i + 1]) for i in range(0, len(poly) - 1, 2)]
        if len(pts) >= 3:
            draw.polygon(pts, outline=1, fill=1)
    return np.asarray(img, bool)


class COCODataset:
    def __init__(self, ann_file, root: str, remove_images_without_annotations: bool = True):
        self.coco = CELL(ann_file)
        self.root = root
        ids = sorted(self.coco.imgs.keys())
        if remove_images_without_annotations:
            ids = [i for i in ids if len(self.coco.getAnnIds(imgIds=i)) > 0]
        self.ids = ids
        # contiguous category mapping (coco.py upstream behavior)
        cat_ids = sorted(self.coco.getCatIds())
        self.json_category_id_to_contiguous_id = {v: i + 1 for i, v in enumerate(cat_ids)}

    def __len__(self):
        return len(self.ids)

    def get_img_info(self, index):
        return self.coco.imgs[self.ids[index]]

    def __getitem__(self, index) -> dict:
        img_id = self.ids[index]
        info = self.coco.imgs[img_id]
        h, w = info["height"], info["width"]
        path = info["file_name"]
        from PIL import Image

        image = np.asarray(Image.open(os.path.join(self.root, path)).convert("RGB"))

        anns = self.coco.loadAnns(self.coco.getAnnIds(imgIds=img_id))
        anns = [a for a in anns if not a.get("iscrowd", 0)]
        boxes, labels, masks = [], [], []
        for a in anns:
            x, y, bw, bh = a["bbox"]
            if bw <= 0 or bh <= 0:
                continue
            boxes.append([x, y, x + bw - 1, y + bh - 1])
            labels.append(self.json_category_id_to_contiguous_id[a["category_id"]])
            seg = a.get("segmentation")
            if isinstance(seg, list):
                masks.append(rasterize_polygons(seg, h, w))
            elif isinstance(seg, dict):  # uncompressed RLE
                from ..evaluation._native import rle_decode

                masks.append(rle_decode(np.asarray(seg["counts"], np.int64), h, w).astype(bool))
            else:
                m = np.zeros((h, w), bool)
                x1, y1, x2, y2 = [int(round(v)) for v in boxes[-1]]
                m[y1 : y2 + 1, x1 : x2 + 1] = True
                masks.append(m)
        return {
            "image": image,
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int32),
            "masks": np.stack(masks).astype(np.uint8) if masks else np.zeros((0, h, w), np.uint8),
        }
