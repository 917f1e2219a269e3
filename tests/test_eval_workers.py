"""Multiprocess host-eval parity: pool workers vs in-process evaluator.

VERDICT r2 item 6: end-to-end eval was host-bound at ~2.4 img/s because
paste+scoring ran single-threaded. engine/_eval_worker.eval_one runs the
identical per-image pipeline in a spawn pool; this asserts stat-identical
results against the serial PapEvaluator on synthetic detections
(including an image with zero valid detections).
"""

import multiprocessing as mp
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from mmt_psm_tpu.engine._eval_worker import eval_one
from mmt_psm_tpu.engine.paste import detections_to_instseg, gt_to_instseg
from mmt_psm_tpu.evaluation.pap_eval import PapEvaluator

H = W = 320
K = 40


def _make_image(rng, n_gt, empty_dt=False):
    gt_boxes = np.zeros((n_gt, 4), np.float32)
    gt_labels = rng.integers(1, 3, n_gt)
    gt_valid = np.ones(n_gt, bool)
    gt_masks = np.zeros((n_gt, H, W), bool)
    for g in range(n_gt):
        cy, cx = rng.uniform(30, H - 30), rng.uniform(30, W - 30)
        ry, rx = rng.uniform(8, 25, 2)
        yy, xx = np.mgrid[0:H, 0:W]
        m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1
        gt_masks[g] = m
        ys, xs = np.nonzero(m)
        gt_boxes[g] = [xs.min(), ys.min(), xs.max(), ys.max()]

    boxes = np.zeros((K, 4), np.float32)
    labels = np.zeros(K, np.int64)
    valid = np.zeros(K, bool)
    scores = rng.uniform(0.05, 1, K).astype(np.float32)
    masks = rng.uniform(0, 1, (K, 28, 28)).astype(np.float16)
    if not empty_dt:
        for k in range(K):
            src = k % n_gt
            boxes[k] = gt_boxes[src] + rng.normal(0, 2, 4)
            labels[k] = gt_labels[src]
            valid[k] = rng.random() < 0.9
    return dict(
        boxes=boxes, scores=scores, labels=labels, valid=valid, masks=masks,
        gt_boxes=gt_boxes, gt_labels=gt_labels, gt_valid=gt_valid, gt_masks=gt_masks,
    )


def test_pool_matches_serial():
    rng = np.random.default_rng(11)
    images = [_make_image(rng, rng.integers(2, 8)) for _ in range(6)]
    images.append(_make_image(rng, 3, empty_dt=True))

    serial = PapEvaluator()
    payloads = []
    for img in images:
        gt = gt_to_instseg(img["gt_boxes"], img["gt_labels"], img["gt_valid"], img["gt_masks"])
        dt = detections_to_instseg(
            img["boxes"], img["scores"], img["labels"], img["valid"],
            np.asarray(img["masks"], np.float32), (H, W),
        )
        serial.add_image(dt, gt)
        payloads.append(
            (img["boxes"], img["scores"], img["labels"], img["valid"], img["masks"],
             (H, W), gt, serial.categories, serial.max_dets, serial.use_iou)
        )

    pooled = PapEvaluator()
    with ProcessPoolExecutor(max_workers=3, mp_context=mp.get_context("spawn")) as ex:
        for fut in [ex.submit(eval_one, p) for p in payloads]:
            pooled.results.extend(fut.result())

    import json

    def canon(stats):  # stat dicts mix int and "all" keys
        return json.dumps(
            {k: {str(c): float(x) for c, x in v.items()} for k, v in stats.items()},
            sort_keys=True,
        )

    a = canon(serial.summarize())
    b = canon(pooled.summarize())
    assert a == b
