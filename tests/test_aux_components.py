"""Tests for auxiliary components: python NMS variants, CELL index,
catalog, COCO/VOC eval, visual overlay."""

import numpy as np
import pytest

from mmt_psm_tpu.data.catalog import DatasetCatalog
from mmt_psm_tpu.data.cell import CELL
from mmt_psm_tpu.evaluation.coco_eval import CocoEvaluator, voc_ap, voc_eval
from mmt_psm_tpu.ops.python_nms import cpu_nms, cyto_nms, set_cpu_nms
from mmt_psm_tpu.utils.visual import instances_to_label_map, overlay_instances


def test_cpu_nms_basic():
    dets = np.array(
        [
            [0, 0, 100, 100, 0.9],
            [5, 5, 105, 105, 0.8],  # overlaps the first
            [200, 200, 300, 300, 0.7],
        ],
        np.float64,
    )
    keep = cpu_nms(dets, 0.5)
    np.testing.assert_array_equal(keep, [0, 2])


def test_cyto_nms_nucleus_assignment():
    boxes = np.array([[0, 0, 50, 50], [5, 5, 55, 55], [100, 100, 150, 150]], np.float64)
    scores = np.array([0.9, 0.8, 0.7])
    # box0 and box1 both contain nucleus 1; box2 contains nucleus 2
    keep = cyto_nms(boxes, scores, [[1], [1], [2]], 0.5)
    np.testing.assert_array_equal(sorted(keep), [0, 2])
    # box1 also contains nucleus 3 -> survives via nucleus 3
    keep = cyto_nms(boxes, scores, [[1], [1, 3], [2]], 0.5)
    np.testing.assert_array_equal(sorted(keep), [0, 1, 2])


def test_set_cpu_nms_same_head_survives():
    boxes = np.array([[0, 0, 100, 100], [2, 2, 102, 102], [4, 4, 104, 104]], np.float64)
    scores = np.array([0.9, 0.8, 0.7])
    # same head id 0 for first two -> both survive; head 1 suppressed
    keep = set_cpu_nms(boxes, scores, np.array([0, 0, 1]), 0.5)
    np.testing.assert_array_equal(keep, [True, True, False])


def test_cell_index():
    ds = {
        "images": [{"id": 1}, {"id": 2}],
        "categories": [{"id": 1, "name": "cyto"}, {"id": 2, "name": "nuclei"}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 1, "area": 50},
            {"id": 11, "image_id": 1, "category_id": 2, "area": 10},
            {"id": 12, "image_id": 2, "category_id": 2, "area": 20},
        ],
    }
    c = CELL(ds)
    assert sorted(c.getImgIds()) == [1, 2]
    assert c.getAnnIds(imgIds=1) == [10, 11]
    assert c.getAnnIds(catIds=[2]) == [11, 12]
    assert c.getCatIds(catNms=["nuclei"]) == [2]
    assert c.loadAnns(10)[0]["area"] == 50
    assert sorted(c.getImgIds(catIds=[2])) == [1, 2]


def test_catalog_synthetic():
    ds = DatasetCatalog.get("synthetic_val")
    assert len(ds) > 0
    s = ds[0]
    assert s["image"].shape[2] == 3
    with pytest.raises(KeyError):
        DatasetCatalog.get("nope")


def test_coco_eval_perfect_bbox():
    ev = CocoEvaluator(categories=(1,), iou_type="bbox")
    gt = {1: {"boxes": np.array([[0, 0, 10, 10], [50, 50, 80, 80]], np.float32)}}
    dt = {1: {"boxes": gt[1]["boxes"].copy(), "scores": np.array([0.9, 0.8])}}
    ev.add_image(dt, gt)
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)


def test_coco_eval_half_recall():
    ev = CocoEvaluator(categories=(1,), iou_type="bbox")
    gt = {1: {"boxes": np.array([[0, 0, 10, 10], [50, 50, 80, 80]], np.float32)}}
    dt = {1: {"boxes": np.array([[0, 0, 10, 10]], np.float32), "scores": np.array([0.9])}}
    ev.add_image(dt, gt)
    stats = ev.summarize()
    assert stats["AP50"] == pytest.approx(51 / 101, rel=1e-6)


def test_voc_ap_and_eval():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec) == pytest.approx(1.0)

    gt = {0: np.array([[0, 0, 10, 10]], np.float32)}
    dts = [(0, 0.9, np.array([0, 0, 10, 10], np.float32)), (0, 0.8, np.array([100, 100, 110, 110], np.float32))]
    rec, prec, ap = voc_eval(dts, gt)
    assert ap == pytest.approx(1.0)  # the TP comes first in score order


def test_overlay_and_label_map():
    from mmt_psm_tpu.evaluation.instmask import InstSeg

    img = np.zeros((50, 50, 3), np.uint8)
    m = np.ones((11, 11), bool)
    inst = InstSeg(boxes=np.array([[5, 5, 15, 15]]), masks=[m], scores=np.array([0.9]))
    pred = {"boxes": np.array([[5.0, 5, 15, 15]]), "labels": np.array([1]), "masks": {1: inst}}
    out = overlay_instances(img, pred)
    assert out.shape == img.shape and out[10, 10].sum() > 0
    lm = instances_to_label_map({1: inst}, 50, 50)
    assert lm.max() == 1 and (lm[5:16, 5:16] == 1).all() and lm[0, 0] == 0


def test_check_expected_results():
    """TEST.EXPECTED_RESULTS statistical regression hook (reference
    engine/inference.py:77-78 + upstream check_expected_results)."""
    import pytest

    from mmt_psm_tpu.engine.inference import check_expected_results

    stats = {"AJI": {2: 0.52, 1: 0.2}, "mAP": {"all": 0.44}}
    report = check_expected_results(stats, [("AJI/2", 0.5, 0.01), ("mAP/all", 0.45, 0.01)], sigma_tol=4)
    assert all(ok for *_, ok in report)
    with pytest.raises(AssertionError, match="AJI/2"):
        check_expected_results(stats, [("AJI/2", 0.9, 0.01)], sigma_tol=4)


@pytest.mark.slow
def test_run_inference_visual_and_mat_outputs(tmp_path):
    """TEST.VISUAL_NUM overlays + .mat export through the eval engine
    (reference pap_eval.py:49-77, tools/test_net.py:109-121)."""
    import os

    import jax

    from mmt_psm_tpu.data.loader import make_test_loader
    from mmt_psm_tpu.data.pap import synthetic_slide_dataset
    from mmt_psm_tpu.engine.inference import run_inference
    from mmt_psm_tpu.models import MaskRCNN

    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_detector import TINY

    model = MaskRCNN(config=TINY)
    ds = synthetic_slide_dataset(seed=9, num_slides=1, slide_size=128, win_size=128, overlap=0.0, is_train=False)
    loader = make_test_loader(ds, 1, 128, max_gt=16, min_size=128, max_size=128)
    first = next(make_test_loader(ds, 1, 128, max_gt=16, min_size=128, max_size=128))
    import jax.numpy as jnp

    params = jax.jit(lambda r, im, sz: model.init(r, im, sz, train=False))(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(first["image"]), jnp.asarray(first["image_size"])
    )
    vis = str(tmp_path / "vis")
    mat = str(tmp_path / "mat")
    run_inference(model, params, loader, visual_num=1, visual_dir=vis, mat_dir=mat)
    assert os.path.isfile(os.path.join(vis, "vis_0000.png"))
    assert os.path.isfile(os.path.join(mat, "img_0000.mat"))
    import scipy.io as sio

    m = sio.loadmat(os.path.join(mat, "img_0000.mat"))["predmap"]
    assert m.shape == (128, 128)
