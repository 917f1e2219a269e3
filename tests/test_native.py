import numpy as np
import pytest

from mmt_psm_tpu.evaluation import _native
from mmt_psm_tpu.evaluation.instmask import InstSeg, iou_int_uni


@pytest.fixture(scope="module")
def native_ok():
    if not _native.available():
        pytest.skip("g++ toolchain unavailable")
    return True


def _random_instseg(rng, n, frame=120):
    masks, boxes = [], []
    for _ in range(n):
        x1, y1 = rng.integers(0, frame - 30, 2)
        w, h = rng.integers(8, 30, 2)
        m = rng.random((h, w)) > 0.4
        m[h // 2, w // 2] = True
        boxes.append([x1, y1, x1 + w - 1, y1 + h - 1])
        masks.append(m)
    return InstSeg(boxes=np.asarray(boxes, np.int64), masks=masks, scores=rng.random(n))


def test_native_matches_numpy_pairs(native_ok):
    rng = np.random.default_rng(0)
    dt = _random_instseg(rng, 17)
    gt = _random_instseg(rng, 9)
    native = _native.pair_intersections(dt.masks, dt.boxes, gt.masks, gt.boxes)

    from mmt_psm_tpu.evaluation.instmask import _pair_intersection

    want = np.zeros((17, 9))
    for i in range(17):
        for j in range(9):
            want[i, j] = _pair_intersection(dt.boxes[i], dt.masks[i], gt.boxes[j], gt.masks[j])
    np.testing.assert_array_equal(native, want)


def test_iou_int_uni_uses_native(native_ok):
    rng = np.random.default_rng(1)
    dt = _random_instseg(rng, 5)
    gt = _random_instseg(rng, 5)
    iou, inter, union = iou_int_uni(dt, gt)
    assert (inter >= 0).all() and (union > 0).all()
    assert (iou <= 1.0 + 1e-9).all()


def test_rle_roundtrip(native_ok):
    rng = np.random.default_rng(2)
    m = (rng.random((23, 31)) > 0.5).astype(np.uint8)
    counts = _native.rle_encode(m)
    back = _native.rle_decode(counts, 23, 31)
    np.testing.assert_array_equal(back, m)
    # counts sum to the pixel count; first run counts zeros
    assert counts.sum() == 23 * 31


def test_rle_known_values(native_ok):
    # column-major: [[1,0],[1,1]] scans col0 (1,1) col1 (0,1)
    m = np.array([[1, 0], [1, 1]], np.uint8)
    counts = _native.rle_encode(m)
    np.testing.assert_array_equal(counts, [0, 2, 1, 1])

    m2 = np.zeros((3, 2), np.uint8)
    counts2 = _native.rle_encode(m2)
    np.testing.assert_array_equal(counts2, [6])
