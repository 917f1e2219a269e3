"""Segmentation conversions + cityscapes converter (SURVEY §2.3 rows
"SegmentationMask round-trip" and "cityscapes converters").
"""

import importlib.util
import json
import os

import numpy as np
import pytest

from mmt_psm_tpu.utils.segms import (
    instances_to_dict_with_polygons,
    mask_to_polygons,
    mask_to_rle,
    polys_to_boxes,
    polys_to_mask,
    rle_to_mask,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _blob(h=64, w=64, cy=30, cx=28, r=14):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r


def test_mask_polygon_roundtrip():
    m = _blob()
    polys = mask_to_polygons(m)
    assert polys and all(len(p) >= 6 for p in polys)
    back = polys_to_mask(polys, *m.shape)
    # rasterization recovers the blob up to boundary pixels
    inter = np.logical_and(m, back).sum()
    union = np.logical_or(m, back).sum()
    assert inter / union > 0.9
    x1, y1, x2, y2 = polys_to_boxes([polys])[0]
    ys, xs = np.nonzero(m)
    assert abs(x1 - xs.min()) <= 1 and abs(x2 - xs.max()) <= 1
    assert abs(y1 - ys.min()) <= 1 and abs(y2 - ys.max()) <= 1


def test_mask_rle_roundtrip_exact():
    rng = np.random.default_rng(0)
    m = rng.uniform(size=(37, 53)) < 0.4
    rle = mask_to_rle(m)
    assert rle["size"] == [37, 53]
    np.testing.assert_array_equal(rle_to_mask(rle).astype(bool), m)


def test_instances_to_dict():
    img = np.zeros((48, 48), np.int32)
    img[5:20, 5:20] = 26000  # car instance 0
    img[25:40, 25:40] = 26001  # car instance 1
    img[2:4, 40:46] = 24  # stuff pixel (person class id, not an instance)
    out = instances_to_dict_with_polygons(img, {24: "person", 26: "car"})
    assert set(out) == {"car"}
    assert len(out["car"]) == 2
    assert out["car"][0]["pixelCount"] == 15 * 15


def _write_cityscapes(root):
    from PIL import Image

    city = os.path.join(root, "gtFine", "val", "faketown")
    os.makedirs(city, exist_ok=True)
    stem = "faketown_000000_000019_"
    with open(os.path.join(city, stem + "gtFine_polygons.json"), "w") as f:
        json.dump({"imgWidth": 64, "imgHeight": 48, "objects": []}, f)
    inst = np.zeros((48, 64), np.int32)
    inst[10:30, 10:30] = 26000  # car
    inst[5:15, 40:60] = 24000  # person
    inst[40:44, 2:6] = 7  # road (stuff)
    Image.fromarray(inst).save(os.path.join(city, stem + "gtFine_instanceIds.png"))


def test_cityscapes_converter(tmp_path):
    _write_cityscapes(str(tmp_path))
    spec = importlib.util.spec_from_file_location(
        "cs_convert", os.path.join(REPO, "tools", "cityscapes", "convert_cityscapes_to_coco.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "out")
    mod.convert_cityscapes_instance_only(str(tmp_path), out, splits=("val",))
    with open(os.path.join(out, "instancesonly_filtered_gtFine_val.json")) as f:
        data = json.load(f)
    assert len(data["images"]) == 1
    assert data["images"][0]["width"] == 64 and data["images"][0]["height"] == 48
    names = {c["name"] for c in data["categories"]}
    assert names == {"car", "person"}
    assert len(data["annotations"]) == 2
    ann = data["annotations"][0]
    assert ann["area"] > 0 and len(ann["segmentation"][0]) > 4
    # the json round-trips through our COCODataset polygon path
    from mmt_psm_tpu.data.coco import COCODataset
    from PIL import Image

    img_dir = str(tmp_path / "imgs")
    os.makedirs(img_dir)
    Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(
        os.path.join(img_dir, data["images"][0]["file_name"])
    )
    # COCODataset keys images by integer ids starting at... our converter uses 0
    ds = COCODataset(os.path.join(out, "instancesonly_filtered_gtFine_val.json"), img_dir)
    s = ds[0]
    assert len(s["boxes"]) == 2 and s["masks"].shape[1:] == (48, 64)
