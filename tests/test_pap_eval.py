import numpy as np

from mmt_psm_tpu.evaluation import InstSeg, PapEvaluator, iou_int_uni


def square_mask(x1, y1, x2, y2, h=100, w=100):
    m = np.zeros((h, w), bool)
    m[y1 : y2 + 1, x1 : x2 + 1] = True
    return m


def inst(specs, scores=None):
    masks = [square_mask(*s) for s in specs]
    return InstSeg.from_full_masks(masks, scores=scores)


def test_iou_int_uni_squares():
    dt = inst([(0, 0, 9, 9)], scores=[0.9])  # 10x10 = 100 px
    gt = inst([(5, 0, 14, 9)])  # shifted by 5 -> overlap 5x10 = 50
    iou, inter, union = iou_int_uni(dt, gt)
    np.testing.assert_allclose(inter[0, 0], 50)
    np.testing.assert_allclose(union[0, 0], 150)
    np.testing.assert_allclose(iou[0, 0], 1 / 3)


def test_perfect_predictions():
    gt = inst([(0, 0, 9, 9), (30, 30, 49, 49)])
    dt = inst([(0, 0, 9, 9), (30, 30, 49, 49)], scores=[0.9, 0.8])
    ev = PapEvaluator(categories=(1,))
    ev.add_image({1: dt}, {1: gt})
    stats = ev.summarize()
    np.testing.assert_allclose(stats["AJI"][1], 1.0)
    np.testing.assert_allclose(stats["F1"][1], 1.0)
    np.testing.assert_allclose(stats["DSC"][1], 1.0)
    np.testing.assert_allclose(stats["TPRP"][1], 1.0)
    np.testing.assert_allclose(stats["FNRo"][1], 0.0)
    np.testing.assert_allclose(stats["FDRo"][1], 0.0)
    np.testing.assert_allclose(stats["mAP"][1], 1.0)
    np.testing.assert_allclose(stats["AP50"][1], 1.0)


def test_one_missed_gt():
    gt = inst([(0, 0, 9, 9), (30, 30, 49, 49)])  # areas 100, 400
    dt = inst([(0, 0, 9, 9)], scores=[0.9])
    ev = PapEvaluator(categories=(1,))
    ev.add_image({1: dt}, {1: gt})
    stats = ev.summarize()
    # AJI: matched I=100 U=100; unmatched gt area 400 added to U
    np.testing.assert_allclose(stats["AJI"][1], 100 / 500)
    # F1: TP=1 FP=0 FN=1 -> P=1, R=.5 -> F1=2/3
    np.testing.assert_allclose(stats["F1"][1], 2 / 3, rtol=1e-6)
    np.testing.assert_allclose(stats["FNRo"][1], 0.5)
    np.testing.assert_allclose(stats["FDRo"][1], 0.0)
    # AP50: recall caps at 0.5 with precision 1 -> 101-pt AP ~ 51/101
    np.testing.assert_allclose(stats["AP50"][1], 51 / 101, rtol=1e-6)


def test_partial_overlap_aji():
    gt = inst([(0, 0, 9, 9)])  # 100 px
    dt = inst([(0, 0, 9, 4)], scores=[0.9])  # 50 px inside gt: IoU=0.5
    ev = PapEvaluator(categories=(1,))
    ev.add_image({1: dt}, {1: gt})
    stats = ev.summarize()
    # IoU = 0.5 >= 0.5 matches: I=50, U=100 -> AJI=0.5
    np.testing.assert_allclose(stats["AJI"][1], 0.5)
    # DSC = 2*50/(100+50) = 2/3 < 0.7 -> no DSC match -> FNRo=1, FDRo=1
    np.testing.assert_allclose(stats["FNRo"][1], 1.0)
    np.testing.assert_allclose(stats["FDRo"][1], 1.0)


def test_duplicate_detection_resolution():
    gt = inst([(0, 0, 9, 9)])
    # two detections on the same gt: best is TP, other is FP
    dt = inst([(0, 0, 9, 9), (1, 0, 9, 9)], scores=[0.9, 0.8])
    ev = PapEvaluator(categories=(1,))
    ev.add_image({1: dt}, {1: gt})
    stats = ev.summarize()
    # F1: TP=1, FP=1, FN=0 -> P=.5, R=1 -> F1=2/3
    np.testing.assert_allclose(stats["F1"][1], 2 / 3, rtol=1e-6)
    np.testing.assert_allclose(stats["AJI"][1], 100 / (100 + 90))  # unmatched dt area 90 -> U


def test_multiclass_and_empty_category():
    gt1 = inst([(0, 0, 9, 9)])
    dt1 = inst([(0, 0, 9, 9)], scores=[0.9])
    gt2 = inst([(50, 50, 59, 59)])
    dt2 = inst([], scores=[])
    ev = PapEvaluator(categories=(1, 2))
    ev.add_image({1: dt1, 2: dt2}, {1: gt1, 2: gt2})
    stats = ev.summarize()
    np.testing.assert_allclose(stats["AJI"][1], 1.0)
    np.testing.assert_allclose(stats["AJI"][2], 0.0)
    np.testing.assert_allclose(stats["F1"][2], 0.0)
    assert "all" in stats["mAP"]


def test_aji_averages_over_images():
    gt = inst([(0, 0, 9, 9)])
    dt_good = inst([(0, 0, 9, 9)], scores=[0.9])
    dt_none = inst([(90, 90, 99, 99)], scores=[0.1])
    ev = PapEvaluator(categories=(1,))
    ev.add_image({1: dt_good}, {1: gt})
    ev.add_image({1: dt_none}, {1: gt})
    stats = ev.summarize()
    # image 1: AJI 1; image 2: no match -> I=0, U=100+100 -> 0
    np.testing.assert_allclose(stats["AJI"][1], 0.5)
