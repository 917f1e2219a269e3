"""K_HEAD>1 branch: matcher top_k + set-NMS (VERDICT r1 item 8).

Reference behaviors pinned here:
* Matcher top_k=2 (reference: maskrcnn_benchmark/modeling/matcher.py:89-108)
* set_cpu_nms selected by K_HEAD>1 + NMS_TYPE='set'
  (box_head/inference.py:120-122, python_nms.py:100-154)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.config import get_cfg
from mmt_psm_tpu.models import MaskRCNN, ModelConfig
from mmt_psm_tpu.models.box_head import set_nms_filter
from mmt_psm_tpu.ops import matcher


def _topk_oracle(quality, high, low, k=2):
    """Transliteration of the torch top_k branch (matcher.py:89-108)."""
    order = np.argsort(-quality, axis=0, kind="stable")
    matches = order[:k]
    vals = np.take_along_axis(quality, matches, axis=0)
    out = matches.copy().astype(np.int64)
    out[vals < low] = matcher.BELOW_LOW_THRESHOLD
    out[(vals >= low) & (vals < high)] = matcher.BETWEEN_THRESHOLDS
    return out


def test_match_topk_vs_oracle():
    rng = np.random.default_rng(0)
    q = rng.uniform(0, 1, (5, 12)).astype(np.float32)
    got = np.asarray(matcher.match_topk(jnp.asarray(q), jnp.ones(5, bool), 0.7, 0.3, top_k=2))
    want = _topk_oracle(q, 0.7, 0.3)
    np.testing.assert_array_equal(got, want)
    # row 0 agrees with the argmax matcher (no low-quality forcing)
    base = np.asarray(matcher.match(jnp.asarray(q), jnp.ones(5, bool), 0.7, 0.3))
    np.testing.assert_array_equal(got[0], base)


def test_match_topk_ignores_padded_gt():
    q = np.zeros((4, 6), np.float32)
    q[0] = 0.9
    q[3] = 0.95  # padded row must never win
    valid = np.array([True, True, True, False])
    got = np.asarray(matcher.match_topk(jnp.asarray(q), jnp.asarray(valid), 0.7, 0.3, top_k=2))
    assert (got[0] == 0).all()
    assert (got != 3).all()


def test_set_nms_filter_semantics():
    # two perfectly overlapping boxes: same head -> both survive,
    # different head -> lower-scored one suppressed
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    labels = np.array([1, 1, 1], np.int32)
    valid = np.ones(3, bool)

    same = set_nms_filter(boxes, scores, labels, valid, np.array([7, 7, 3]), nms_thresh=0.5)
    np.testing.assert_array_equal(same, [True, True, True])

    diff = set_nms_filter(boxes, scores, labels, valid, np.array([7, 8, 3]), nms_thresh=0.5)
    np.testing.assert_array_equal(diff, [True, False, True])

    # classes are independent (per-class loop, inference.py:111-132)
    labels2 = np.array([1, 2, 1], np.int32)
    both = set_nms_filter(boxes, scores, labels2, valid, np.array([7, 8, 3]), nms_thresh=0.5)
    np.testing.assert_array_equal(both, [True, True, True])


def test_from_cfg_set_nms_switches():
    cfg = get_cfg()
    assert ModelConfig.from_cfg(cfg).nms_type == "greedy"
    cfg.MODEL.ROI_HEADS.NMS_TYPE = "set"
    # NMS_TYPE alone is not enough (K_HEAD=1) — inference.py:120-122
    assert ModelConfig.from_cfg(cfg).nms_type == "greedy"
    cfg.MODEL.ROI_BOX_HEAD.K_HEAD = 2.0
    assert ModelConfig.from_cfg(cfg).nms_type == "set"


@pytest.mark.slow
def test_set_nms_model_path_produces_head_ids():
    import jax

    from test_detector import TINY, _batch

    import dataclasses

    model = MaskRCNN(config=dataclasses.replace(TINY, nms_type="set", mask_on=False))
    images, sizes, gt = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, train=True,
    )["params"]
    dets = jax.jit(lambda p, x, s: model.apply({"params": p}, x, s, train=False))(params, images, sizes)
    assert dets.head_ids is not None and dets.head_ids.shape == dets.scores.shape
    h = np.asarray(dets.head_ids)
    v = np.asarray(dets.valid)
    assert (h[v] >= 0).all()
    # the host filter runs end-to-end on the padded arrays
    kept = set_nms_filter(
        np.asarray(dets.boxes)[0], np.asarray(dets.scores)[0], np.asarray(dets.labels)[0],
        v[0], h[0], nms_thresh=0.5,
    )
    assert kept.sum() <= v[0].sum()
