import json
import os

import numpy as np

from mmt_psm_tpu.data.coco import COCODataset, rasterize_polygons
from mmt_psm_tpu.data.transforms import tta_transform


def test_rasterize_polygons_square():
    m = rasterize_polygons([[2, 2, 8, 2, 8, 8, 2, 8]], 12, 12)
    assert m[5, 5] and not m[0, 0]
    assert 36 <= m.sum() <= 49


def test_coco_dataset_roundtrip(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    Image.fromarray(np.zeros((32, 48, 3), np.uint8)).save(img_dir / "a.png")
    ann = {
        "images": [{"id": 1, "file_name": "a.png", "height": 32, "width": 48}],
        "categories": [{"id": 7, "name": "cyto"}, {"id": 9, "name": "nuclei"}],
        "annotations": [
            {
                "id": 1, "image_id": 1, "category_id": 9, "iscrowd": 0,
                "bbox": [4, 4, 10, 8], "area": 80,
                "segmentation": [[4, 4, 13, 4, 13, 11, 4, 11]],
            }
        ],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    ds = COCODataset(str(ann_path), str(img_dir))
    assert len(ds) == 1
    s = ds[0]
    assert s["image"].shape == (32, 48, 3)
    assert s["boxes"].shape == (1, 4)
    assert s["labels"][0] == 2  # category 9 -> contiguous id 2
    assert s["masks"][0, 6, 6] == 1


def test_tta_transform_views():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    out = tta_transform({"image": img}, rng, k=3, min_size=64)
    assert len(out["views"]) == 3
    assert out["views"][0].shape == (64, 64, 3)
    assert np.abs(out["views"][0] - out["views"][1]).max() > 0
