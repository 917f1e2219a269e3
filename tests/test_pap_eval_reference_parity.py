"""Evaluator head-to-head: the reference's ``Papeval`` vs ``PapEvaluator``.

VERDICT r2 item 4: run the ACTUAL reference evaluator class
(maskrcnn_benchmark/data/datasets/evaluation/pap/pap_eval.py:212-975 —
pure Python above ``maskUtils``) with its ``iouIntUni``/``area``/
``merge`` shimmed to this repo's own mask backend
(evaluation/instmask.iou_int_uni, native csrc/papeval.cpp when built),
against ``PapEvaluator`` on randomized synthetic instance sets covering
zero-dt / zero-gt / both-empty edge cases, and assert ALL 10 summary
stats (AJI F1 DSC TPRP FNRo FDRo mAP AP50 AP75 AP85) agree per class
and for 'all'.

Until this test, quirk reproduction (e.g. zero-detection FNR/FDR=0,
pap_eval.py:436-445) rested on reading the reference, not running it.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
import ref_stack

from mmt_psm_tpu.evaluation.instmask import InstSeg, iou_int_uni
from mmt_psm_tpu.evaluation.pap_eval import PapEvaluator

CATS = (1, 2)
H, W = 120, 160


# ---------------------------------------------------------------- ref import
@pytest.fixture(scope="module")
def ref_papeval():
    ref_stack.load_reference()  # stubs _C, pycocotools, skimage, yacs, ...

    # visual.py pulls missing preprocess.colors + openslide (SURVEY dead
    # list); pap_eval imports display_instance from it.
    pre = types.ModuleType("preprocess")
    pre.colors = types.ModuleType("preprocess.colors")
    pre.colors.get_colors = lambda n: [(255, 0, 0)] * n
    sys.modules.setdefault("preprocess", pre)
    sys.modules.setdefault("preprocess.colors", pre.colors)
    sys.modules.setdefault("openslide", types.ModuleType("openslide"))
    sys.modules.setdefault("slidingwindow", types.ModuleType("slidingwindow"))
    # the datasets package __init__ chains to coco.py -> torchvision.datasets
    tv = sys.modules["torchvision"]
    tvd = types.ModuleType("torchvision.datasets")
    tvd.coco = types.ModuleType("torchvision.datasets.coco")
    tvd.coco.CocoDetection = object
    sys.modules.setdefault("torchvision.datasets", tvd)
    sys.modules.setdefault("torchvision.datasets.coco", tvd.coco)
    if not hasattr(tv, "datasets"):
        tv.datasets = tvd
    tvt = types.ModuleType("torchvision.transforms")
    tvt.functional = types.ModuleType("torchvision.transforms.functional")
    sys.modules.setdefault("torchvision.transforms", tvt)
    sys.modules.setdefault("torchvision.transforms.functional", tvt.functional)
    if not hasattr(tv, "transforms"):
        tv.transforms = tvt

    # shim the patched-pycocotools surface onto OUR backend. The
    # 'segmentation' payloads are full-frame bool masks.
    mask_mod = sys.modules["pycocotools.mask"]

    def _area(x):
        if isinstance(x, (list, tuple)):
            return np.asarray([float(np.count_nonzero(m)) for m in x], np.float64)
        return float(np.count_nonzero(x))

    def _merge(xs, intersect=False):
        assert not intersect
        out = np.zeros((H, W), bool)
        for m in xs:
            out |= m.astype(bool)
        return out

    def _iou_int_uni(d, g, iscrowd):
        dt = InstSeg.from_full_masks([m.astype(bool) for m in d])
        gt = InstSeg.from_full_masks([m.astype(bool) for m in g])
        iou, inter, union = iou_int_uni(dt, gt)
        return [iou, inter, union]

    mask_mod.area = _area
    mask_mod.merge = _merge
    mask_mod.iouIntUni = _iou_int_uni

    # numpy>=1.24 rejects float `num` in np.linspace; the reference
    # builds its thresholds with np.round(...) float nums at import time
    # (pap_eval.py:480, :961-968) — int-coerce during import/use only.
    orig_linspace = np.linspace

    def _linspace(start, stop, num=50, **kw):
        return orig_linspace(start, stop, int(round(float(num))), **kw)

    np.linspace = _linspace
    try:
        import maskrcnn_benchmark.data.datasets.evaluation.pap.pap_eval as ref_pe
    finally:
        pass  # Params() also calls np.linspace at construction; keep patched
    yield ref_pe
    np.linspace = orig_linspace


# ---------------------------------------------------------------- synth data
def _blob(rng):
    """One random filled ellipse as a full-frame bool mask."""
    cy, cx = rng.uniform(8, H - 8), rng.uniform(8, W - 8)
    ry, rx = rng.uniform(3, 14), rng.uniform(3, 14)
    yy, xx = np.mgrid[0:H, 0:W]
    return ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0


def _shift(mask, rng, max_px=6):
    dy, dx = rng.integers(-max_px, max_px + 1, size=2)
    out = np.zeros_like(mask)
    ys, xs = np.nonzero(mask)
    ys, xs = ys + dy, xs + dx
    ok = (ys >= 0) & (ys < H) & (xs >= 0) & (xs < W)
    out[ys[ok], xs[ok]] = True
    return out


def _make_image(rng, n_gt_by_cat, n_fp_by_cat):
    """Returns {cat: (gt_masks, dt_masks, dt_scores)}; dts = perturbed
    gts (dropping some) + false positives, so IoUs span [0, ~0.9]."""
    out = {}
    for cat in CATS:
        gts = [_blob(rng) for _ in range(n_gt_by_cat[cat])]
        dts = []
        for g in gts:
            if rng.random() < 0.75:  # detected, with jitter
                d = _shift(g, rng)
                if d.any():
                    dts.append(d)
        dts += [_blob(rng) for _ in range(n_fp_by_cat[cat])]
        rng.shuffle(dts)
        scores = rng.uniform(0.05, 1.0, size=len(dts))
        out[cat] = (gts, dts, scores)
    return out


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(7)
    images = []
    for i in range(50):
        n_gt = {1: int(rng.integers(1, 7)), 2: int(rng.integers(0, 5))}
        n_fp = {1: int(rng.integers(0, 3)), 2: int(rng.integers(0, 3))}
        if i == 3:  # cat with gts but zero dts
            n_gt, n_fp = {1: 4, 2: 2}, {1: 0, 2: 0}
        if i == 5:  # cat 2: dts but zero gts
            n_gt, n_fp = {1: 2, 2: 0}, {1: 1, 2: 3}
        if i == 9:  # cat 2 entirely empty (skipped per-(img,cat))
            n_gt, n_fp = {1: 3, 2: 0}, {1: 1, 2: 0}
        img = _make_image(rng, n_gt, n_fp)
        if i == 3:  # force zero detections in both cats
            img = {c: (g, [], np.zeros(0)) for c, (g, d, s) in img.items()}
        images.append(img)
    return images


# ------------------------------------------------------------------ the test
def _run_reference(ref_pe, images):
    gts, dts = [], []
    for i, img in enumerate(images):
        image_id = {"file_name": "img%03d" % i, "location": (0, 0), "id": i + 1}
        for cat in CATS:
            g_masks, d_masks, scores = img[cat]
            for m in g_masks:
                gts.append({"image_id": image_id, "category_id": cat, "segmentation": m})
            for m, s in zip(d_masks, scores):
                dts.append(
                    {
                        "image_id": image_id,
                        "category_id": cat,
                        "segmentation": m,
                        "score": float(s),
                    }
                )
    pe = ref_pe.Papeval(gts, dts, "segm")
    pe.evaluate()
    pe.accumulate()
    pe.summarize()
    return pe.stats


def _run_mine(images):
    ev = PapEvaluator(categories=CATS)
    for img in images:
        dt_by_cat, gt_by_cat = {}, {}
        for cat in CATS:
            g_masks, d_masks, scores = img[cat]
            gt_by_cat[cat] = InstSeg.from_full_masks(g_masks)
            dt_by_cat[cat] = InstSeg.from_full_masks(d_masks, scores=scores)
        ev.add_image(dt_by_cat, gt_by_cat)
    return ev.summarize()


def test_all_summary_stats_match(ref_papeval, dataset):
    ref_stats = _run_reference(ref_papeval, dataset)
    my_stats = _run_mine(dataset)
    report = []
    for key in ["AJI", "F1", "DSC", "TPRP", "FNRo", "FDRo", "mAP", "AP50", "AP75", "AP85"]:
        cats = list(CATS) + (["all"] if "all" in ref_stats[key] else [])
        for cat in cats:
            # ref AJI accumulates a (1,1) per-image value into a
            # (10,1) zeros buffer (summarize:845) — rows identical
            ref_val = np.asarray(ref_stats[key][cat], np.float64)
            assert np.allclose(ref_val, ref_val.flat[0])
            r = float(ref_val.flat[0])
            m = float(my_stats[key][cat])
            report.append((key, cat, r, m))
            assert abs(r - m) < 1e-9, (key, cat, r, m)
    # sanity: the comparison must be on non-trivial values
    vals = [r for _, _, r, _ in report]
    assert sum(1 for v in vals if 0.05 < v < 0.999) >= 10, report
