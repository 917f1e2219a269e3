"""Parity: C++ scoring kernels (map_matches / aji_match) vs the pure-
Python oracles in evaluation/pap_eval.py.

The Python loops transliterate the reference's greedy matching
(reference pap_eval.py:480-509 cal_MAP, :573-630 AJI); the C++ kernels
(csrc/papeval.cpp) must be bit-exact, including tie handling (equal
IoU -> later index wins) and the min(thr, 1-1e-10) clamp.
"""

import numpy as np
import pytest

from mmt_psm_tpu.evaluation import _native
from mmt_psm_tpu.evaluation import pap_eval as pe
from mmt_psm_tpu.evaluation.instmask import InstSeg

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native eval backend unavailable"
)


def _rand_stats(rng, d, g, ties=False):
    iou = rng.random((d, g))
    iou[rng.random((d, g)) < 0.6] = 0.0  # sparse overlap, like real scenes
    if ties and d > 1:
        iou[1] = iou[0]  # exact duplicate rows force tie-breaking
    union = rng.integers(50, 5000, (d, g)).astype(np.float64)
    inter = iou * union
    return iou, inter, union


def _py_map_matches(n_dt, n_gt, ious, thrs):
    """The pure-Python oracle (native path disabled)."""
    T = len(thrs)
    gtm = np.zeros((T, n_gt))
    dtm = np.zeros((T, n_dt))
    for tind, t in enumerate(thrs):
        for dind in range(n_dt):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(n_gt):
                if gtm[tind, gind] > 0:
                    continue
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dtm[tind, dind] = m + 1
            gtm[tind, m] = dind + 1
    return dtm, gtm


def _py_aji(ious, inter, union, dt_areas, gt_areas):
    D, G = ious.shape
    gt_matched = np.zeros(G, bool)
    dt_matched = np.zeros(D, bool)
    I_sum = U_sum = 0.0
    for gind in range(G):
        iou = min(0.5, 1 - 1e-10)
        m = -1
        _i = _u = 0.0
        for dind in range(D):
            if dt_matched[dind]:
                continue
            if ious[dind, gind] < iou:
                continue
            iou = ious[dind, gind]
            _i = inter[dind, gind]
            _u = union[dind, gind]
            m = dind
        if m == -1:
            continue
        dt_matched[m] = True
        gt_matched[gind] = True
        I_sum += _i
        U_sum += _u
    U_sum += dt_areas[~dt_matched].sum() + gt_areas[~gt_matched].sum()
    return I_sum / U_sum if U_sum > 0 else 0.0


@pytest.mark.parametrize("d,g,ties", [(1, 1, False), (7, 3, False), (40, 25, True),
                                      (100, 60, False), (3, 50, True)])
def test_map_matches_parity(d, g, ties):
    rng = np.random.default_rng(d * 100 + g)
    iou, _, _ = _rand_stats(rng, d, g, ties)
    # exact threshold hits exercise the strict `<` skip
    iou[0, 0] = 0.5
    dtm_n, gtm_n = _native.map_matches(iou, pe.IOU_THRS.astype(np.float64), d, g)
    dtm_p, gtm_p = _py_map_matches(d, g, iou, pe.IOU_THRS)
    np.testing.assert_array_equal(dtm_n, dtm_p)
    np.testing.assert_array_equal(gtm_n, gtm_p)


@pytest.mark.parametrize("d,g,ties", [(1, 1, False), (7, 3, True), (40, 25, False),
                                      (100, 60, True), (2, 30, False)])
def test_aji_parity(d, g, ties):
    rng = np.random.default_rng(d * 97 + g)
    iou, inter, union = _rand_stats(rng, d, g, ties)
    iou[0, 0] = 0.5  # boundary: exactly at the 0.5 bar -> counts as match
    dt_areas = rng.integers(10, 4000, d).astype(np.float64)
    gt_areas = rng.integers(10, 4000, g).astype(np.float64)
    aji_n = _native.aji_match(iou, inter, union, dt_areas, gt_areas)
    aji_p = _py_aji(iou, inter, union, dt_areas, gt_areas)
    assert aji_n == pytest.approx(aji_p, abs=0.0), (aji_n, aji_p)


def test_evaluator_output_invariant_to_backend(monkeypatch):
    """Full PapEvaluator stats identical with the native scoring kernels
    on vs off (the reference-parity suite runs whichever backend is
    available; this pins that the backends agree end to end)."""
    rng = np.random.default_rng(0)

    def synth(n, scores):
        boxes, masks = [], []
        for _ in range(n):
            x1, y1 = rng.integers(0, 900, 2)
            w, h = rng.integers(5, 80, 2)
            m = rng.random((h + 1, w + 1)) > 0.4
            m[0, 0] = True
            boxes.append([x1, y1, x1 + w, y1 + h])
            masks.append(m)
        return InstSeg(np.array(boxes, np.int64), masks,
                       rng.random(n) if scores else None)

    images = [
        ({1: synth(12, True), 2: synth(9, True)},
         {1: synth(8, False), 2: synth(7, False)})
        for _ in range(6)
    ]
    images.append(({1: synth(5, True)}, {2: synth(4, False)}))  # disjoint cats

    def run():
        ev = pe.PapEvaluator()
        for dt, gt in images:
            ev.add_image(dt, gt)
        return ev.summarize()

    ref = run()
    monkeypatch.setattr(_native, "available", lambda: False)
    fallback = run()
    for stat, per_cat in ref.items():
        for cat, v in per_cat.items():
            assert fallback[stat][cat] == pytest.approx(v, abs=1e-12), (stat, cat)


def test_native_paste_bit_equality():
    """csrc paste_resize_threshold vs the numpy _bilinear_resize path:
    bit-identical bitmasks over random prob maps and boxes including
    edge-clipped and sub-pixel ones (the kernel computes only the
    image-clipped window of the full bh x bw resize)."""
    import numpy as np

    from mmt_psm_tpu.engine.paste import _bilinear_resize
    from mmt_psm_tpu.evaluation import _native

    if not _native.available():
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    for _ in range(60):
        m = int(rng.choice([25, 28]))
        prob = rng.uniform(0, 1, (m, m)).astype(np.float32)
        im = 400
        x0, y0 = rng.uniform(-60, 380, 2)
        w, h = rng.uniform(1, 200, 2)
        box = np.array([x0, y0, x0 + w, y0 + h], np.float32)
        scale = (m + 2.0) / m
        w_half = (box[2] - box[0]) * 0.5 * scale
        h_half = (box[3] - box[1]) * 0.5 * scale
        cx, cy = (box[2] + box[0]) * 0.5, (box[3] + box[1]) * 0.5
        bx = np.array([cx - w_half, cy - h_half, cx + w_half, cy + h_half]).astype(np.int32)
        bw = max(int(bx[2] - bx[0] + 1), 1)
        bh = max(int(bx[3] - bx[1] + 1), 1)
        X0, Y0 = max(int(bx[0]), 0), max(int(bx[1]), 0)
        X1, Y1 = min(int(bx[2]) + 1, im), min(int(bx[3]) + 1, im)
        if X1 <= X0 or Y1 <= Y0:
            continue
        padded = np.zeros((m + 2, m + 2), np.float32)
        padded[1:-1, 1:-1] = prob
        ref = (_bilinear_resize(padded, bh, bw) > 0.5)[
            (Y0 - bx[1]) : (Y1 - bx[1]), (X0 - bx[0]) : (X1 - bx[0])
        ]
        nat = _native.paste_resize_threshold(
            prob, 1, bh, bw,
            Y0 - int(bx[1]), Y1 - int(bx[1]), X0 - int(bx[0]), X1 - int(bx[0]), 0.5,
        )
        np.testing.assert_array_equal(ref, nat)
