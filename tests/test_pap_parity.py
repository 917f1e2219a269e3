"""Pap dataset parity behaviors (VERDICT r1 item 7).

Each test mirrors one reference behavior:
* empty-patch redraw in __getitem__ (reference Pap.py:225-255)
* both-classes redraw for the source split (Pap.py:570-573)
* TRAIN_RATIO window subsetting (Pap.py:494-496)
* patch caching to a temp dir (store_tmp_train_patches, Pap.py:193-223)
* the __getitem__ GT-filter cutoff: 0.05 train/val vs 0.005 test
  (Pap.py:293, 622)
"""

import os

import numpy as np

from mmt_psm_tpu.data.pap import PapDataset, SlideAnnotations


def _slide_with(instances, size=64):
    """One slide with given (box, label) instances as filled rect masks."""
    img = np.full((size, size, 3), 128, np.uint8)
    boxes, labels, masks = [], [], []
    for (x1, y1, x2, y2), lab in instances:
        m = np.zeros((size, size), bool)
        m[y1 : y2 + 1, x1 : x2 + 1] = True
        boxes.append([x1, y1, x2, y2])
        labels.append(lab)
        masks.append(m)
    ann = SlideAnnotations(
        boxes=np.asarray(boxes, np.float32).reshape(-1, 4),
        labels=np.asarray(labels, np.int32),
        masks=masks,
    )
    return img, ann


def _sliver_setup():
    """One instance: a 30x30 blob in window (0,0) plus a thin arm
    crossing into window (32,0). In-window fraction ~2% — below the
    train cutoff (0.05), above the test cutoff (0.005). The arm's bbox
    intersects the window, so the window survives the index-time
    unsuitable-patch filter and goes empty only at __getitem__ time."""
    size = 64
    img = np.full((size, size, 3), 128, np.uint8)
    m = np.zeros((size, size), bool)
    m[0:30, 0:30] = True
    m[10:19, 30:34] = True  # arm; 2 columns land in window x>=32
    frac = m[:, 32:].sum() / m.sum()
    assert 0.005 < frac < 0.05, frac
    ann = SlideAnnotations(
        boxes=np.asarray([[0, 0, 33, 29]], np.float32),
        labels=np.asarray([1], np.int32),
        masks=[m],
    )
    return img, ann


def test_empty_patch_resample():
    img, ann = _sliver_setup()
    ds = PapDataset(
        [img], [ann], win_size=32, overlap=0.0, is_train=True, resample_empty=True
    )
    # index keeps (0,0) [real GT] and (32,0) [sliver bbox only]; the
    # bottom two windows have no bbox overlap and are pre-filtered
    assert len(ds) == 2
    for i in range(len(ds)):
        s = ds[i]
        assert len(s["boxes"]) > 0, "resample must never yield an empty train sample"

    # with resampling off the filtered window stays empty
    ds2 = PapDataset(
        [img], [ann], win_size=32, overlap=0.0, is_train=True, resample_empty=False
    )
    empties = sum(1 for i in range(len(ds2)) if len(ds2[i]["boxes"]) == 0)
    assert empties == 1


def test_both_classes_resample():
    # window (0,0) has both classes; window (32,0) only class 1
    img, ann = _slide_with(
        [((4, 4, 16, 16), 1), ((18, 18, 28, 28), 2), ((36, 4, 60, 28), 1), ((4, 36, 28, 60), 1), ((36, 36, 60, 60), 2)],
        size=64,
    )
    ds = PapDataset(
        [img], [ann], win_size=32, overlap=0.0, is_train=True,
        min_patch_gt_area_ratio=0.0, require_both_classes=True, resample_empty=True,
    )
    for i in range(len(ds)):
        labs = set(ds[i]["labels"].tolist())
        assert {1, 2} <= labs, f"window {i} lacks a class: {labs}"


def test_train_ratio_subsetting():
    img, ann = _slide_with([((4, 4, 60, 60), 1)], size=64)
    full = PapDataset([img, img], [ann, ann], win_size=32, overlap=0.0, is_train=True, min_patch_gt_area_ratio=0.0)
    half = PapDataset([img, img], [ann, ann], win_size=32, overlap=0.0, is_train=True, min_patch_gt_area_ratio=0.0, train_ratio=0.5)
    assert len(half) == int(len(full) * 0.5)
    # the kept windows are the prefix (Pap.py:496)
    assert half.index == full.index[: len(half)]
    # eval mode ignores the ratio
    ev = PapDataset([img], [ann], win_size=32, overlap=0.0, is_train=False, train_ratio=0.5)
    assert len(ev) == 4


def test_patch_caching(tmp_path):
    img, ann = _slide_with([((4, 4, 60, 60), 1)], size=64)
    cache = str(tmp_path / "patches")
    ds = PapDataset(
        [img], [ann], win_size=32, overlap=0.0, is_train=True,
        min_patch_gt_area_ratio=0.0, cache_dir=cache,
    )
    files = sorted(os.listdir(cache))
    assert len(files) == len(ds) and all(f.endswith(".png") for f in files)
    # cached reads match direct crops
    s = ds[0]
    si, x, y = ds.index[0]
    direct = img[y : y + 32, x : x + 32]
    np.testing.assert_array_equal(s["image"], direct)
    # a second dataset over the same cache reuses the files (same mtimes)
    mtimes = {f: os.path.getmtime(os.path.join(cache, f)) for f in files}
    ds2 = PapDataset(
        [img], [ann], win_size=32, overlap=0.0, is_train=True,
        min_patch_gt_area_ratio=0.0, cache_dir=cache,
    )
    assert {f: os.path.getmtime(os.path.join(cache, f)) for f in files} == mtimes


def test_split_dependent_area_cutoff():
    # the sliver instance (~3% in-window) is dropped at the train/val
    # cutoff (0.05) but kept at the test cutoff (0.005)
    img, ann = _sliver_setup()
    train_ds = PapDataset([img], [ann], win_size=32, overlap=0.0, is_train=True, resample_empty=False)
    test_ds = PapDataset([img], [ann], win_size=32, overlap=0.0, is_train=False)
    assert train_ds.area_ratio_cutoff == 0.05
    assert test_ds.area_ratio_cutoff == 0.005

    def window_sample(ds):
        i = ds.index.index((0, 32, 0))
        return ds[i]

    assert len(window_sample(train_ds)["boxes"]) == 0
    assert len(window_sample(test_ds)["boxes"]) == 1
