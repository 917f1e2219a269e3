"""VOC dataset + evaluator + evaluation dispatcher (VERDICT r1 item 10).

The evaluator is checked golden against the reference's own
eval_detection_voc (reference: maskrcnn_benchmark/data/datasets/
evaluation/voc/voc_eval.py:49-217) running on torch BoxLists.
"""

import os
import sys
import types

import numpy as np
import pytest

from mmt_psm_tpu.data.voc import PascalVOCDataset
from mmt_psm_tpu.evaluation.voc_eval import do_voc_evaluation, eval_detection_voc

REFERENCE = "/root/reference"

VOC_XML = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>
"""
OBJ_XML = """<object>
    <name>{name}</name><difficult>{difficult}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


def _rand_case(rng, n_images=4, n_classes=3):
    preds, gts = [], []
    for _ in range(n_images):
        n_p = int(rng.integers(0, 8))
        n_g = int(rng.integers(0, 5))

        def boxes(n):
            xy = rng.uniform(0, 80, (n, 2))
            wh = rng.uniform(4, 40, (n, 2))
            return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)

        preds.append(
            {
                "boxes": boxes(n_p),
                "labels": rng.integers(1, n_classes + 1, n_p).astype(np.int64),
                "scores": rng.uniform(0, 1, n_p),
            }
        )
        gts.append(
            {
                "boxes": boxes(n_g),
                "labels": rng.integers(1, n_classes + 1, n_g).astype(np.int64),
                "difficult": rng.uniform(0, 1, n_g) < 0.3,
            }
        )
    return preds, gts


@pytest.fixture(scope="module")
def ref_voc():
    torch = pytest.importorskip("torch")
    sys.dont_write_bytecode = True
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if "maskrcnn_benchmark._C" not in sys.modules:
        fake = types.ModuleType("maskrcnn_benchmark._C")
        fake.nms = lambda *a, **k: None
        sys.modules["maskrcnn_benchmark._C"] = fake
    if "torch._six" not in sys.modules:
        # the reference targets torch 1.x; samplers import torch._six
        six = types.ModuleType("torch._six")
        six.int_classes = int
        six.string_classes = str
        six.PY3 = True
        sys.modules["torch._six"] = six
        torch._six = six
    # load the evaluator file directly — the data package __init__ chain
    # would pull torchvision, which this environment doesn't ship
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_voc_eval",
        os.path.join(REFERENCE, "maskrcnn_benchmark/data/datasets/evaluation/voc/voc_eval.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref_eval = mod.eval_detection_voc
    from maskrcnn_benchmark.structures.bounding_box import BoxList

    def run(preds, gts, use_07_metric):
        import torch as T

        pred_bl, gt_bl = [], []
        for p, g in zip(preds, gts):
            bl = BoxList(T.as_tensor(p["boxes"]).reshape(-1, 4), (100, 100))
            bl.add_field("labels", T.as_tensor(p["labels"]))
            bl.add_field("scores", T.as_tensor(p["scores"]))
            pred_bl.append(bl)
            bl = BoxList(T.as_tensor(g["boxes"]).reshape(-1, 4), (100, 100))
            bl.add_field("labels", T.as_tensor(g["labels"]))
            bl.add_field("difficult", T.as_tensor(g["difficult"]))
            gt_bl.append(bl)
        return ref_eval(pred_bl, gt_bl, iou_thresh=0.5, use_07_metric=use_07_metric)

    return run


@pytest.mark.parametrize("use_07", [True, False])
def test_eval_detection_voc_golden_vs_reference(ref_voc, use_07):
    rng = np.random.default_rng(17)
    for trial in range(5):
        preds, gts = _rand_case(rng)
        ours = eval_detection_voc(preds, gts, use_07_metric=use_07)
        want = ref_voc(preds, gts, use_07)
        np.testing.assert_allclose(ours["ap"], want["ap"], rtol=1e-9, equal_nan=True)
        if not (np.isnan(ours["map"]) and np.isnan(want["map"])):
            np.testing.assert_allclose(ours["map"], want["map"], rtol=1e-9)


def _write_voc(root):
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    from PIL import Image

    objs = [
        OBJ_XML.format(name="dog", difficult=0, x1=10, y1=20, x2=40, y2=60),
        OBJ_XML.format(name="cat", difficult=1, x1=50, y1=50, x2=70, y2=80),
    ]
    with open(os.path.join(root, "Annotations", "im0.xml"), "w") as f:
        f.write(VOC_XML.format(w=100, h=90, objects="\n".join(objs)))
    Image.fromarray(np.zeros((90, 100, 3), np.uint8)).save(os.path.join(root, "JPEGImages", "im0.jpg"))
    with open(os.path.join(root, "ImageSets", "Main", "trainval.txt"), "w") as f:
        f.write("im0\n")


def test_pascal_voc_dataset(tmp_path):
    _write_voc(str(tmp_path))
    ds = PascalVOCDataset(str(tmp_path), "trainval", use_difficult=True)
    assert len(ds) == 1
    gt = ds.get_groundtruth(0)
    # TO_REMOVE: xml 1-based -> 0-based (voc.py:96-108)
    np.testing.assert_array_equal(gt["boxes"][0], [9, 19, 39, 59])
    assert gt["labels"].tolist() == [ds.class_to_ind["dog"], ds.class_to_ind["cat"]]
    assert gt["difficult"].tolist() == [False, True]
    assert ds.get_img_info(0) == {"height": 90, "width": 100}
    s = ds[0]
    assert s["image"].shape == (90, 100, 3) and len(s["boxes"]) == 2

    # difficult objects dropped without the flag (voc.py:94-96)
    ds2 = PascalVOCDataset(str(tmp_path), "trainval", use_difficult=False)
    assert len(ds2.get_groundtruth(0)["labels"]) == 1


def test_do_voc_evaluation_end_to_end(tmp_path):
    _write_voc(str(tmp_path))
    ds = PascalVOCDataset(str(tmp_path), "trainval", use_difficult=True)
    # a perfect prediction for the dog box
    preds = [
        {
            "boxes": np.asarray([[9, 19, 39, 59]], np.float32),
            "labels": np.asarray([ds.class_to_ind["dog"]], np.int64),
            "scores": np.asarray([0.9]),
        }
    ]
    out = str(tmp_path / "out")
    os.makedirs(out)
    result = do_voc_evaluation(ds, preds, out)
    dog = ds.class_to_ind["dog"]
    assert result["ap"][dog] == pytest.approx(1.0)
    assert os.path.isfile(os.path.join(out, "result.txt"))


def test_dispatcher_routes_by_dataset_type(tmp_path):
    from mmt_psm_tpu.evaluation import evaluate

    _write_voc(str(tmp_path))
    ds = PascalVOCDataset(str(tmp_path), "trainval", use_difficult=True)
    preds = [
        {
            "boxes": np.asarray([[9, 19, 39, 59]], np.float32),
            "labels": np.asarray([ds.class_to_ind["dog"]], np.int64),
            "scores": np.asarray([0.9]),
            "valid": np.asarray([True]),
            "image_hw": (90, 100),
        }
    ]
    result = evaluate(ds, preds)
    assert "map" in result

    # unsupported type raises like the reference (evaluation/__init__.py:29-32)
    with pytest.raises(NotImplementedError):
        evaluate(object(), [])
