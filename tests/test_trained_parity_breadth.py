"""Trained-weights parity for the remaining config families (VERDICT r4
item 8): the BCE relation-NMS branch (REG_IOU=False) and the K_HEAD>1
set-NMS box post-processor, both asserted in the TRAINED score regime.

tests/test_trained_pipeline_parity.py pins REG_IOU=True (MSE relation
loss / raw-logit score merge). Here the SAME cached ref_train weights
(the classifier shapes are identical under either flag) are run through
both stacks with:

* ``REG_IOU=False`` — the reference's sigmoid + score-product merge at
  test time (relation_module.py:200-233: ``sigmoid(logits)`` at :201,
  ``scores = sorted_features * scores`` at :233) instead of the raw
  regression logits gated by ``scores > fg_thread``;
* ``K_HEAD=2 + NMS_TYPE='set'`` with relation-NMS OFF — the set-NMS
  branch of the box post-processor (box_head/inference.py:120-122,
  python_nms.py:100-154).

Set-NMS note, recorded deliberately: the reference's shipped callsite
never threads ``head_id`` into the post-processor
(box_head/box_head.py:58 passes none; inference.py:101-103 then zero-
fills), and with uniform head ids its set-NMS keep loop resurrects
every overlapping box — i.e. the shipped path degenerates to an
identity filter (asserted below). The post-processor API itself
accepts per-proposal head ids (inference.py:36,66-67), which is what
this repo's device pass tags (models/box_head.py head_ids=prop_idx);
the composed parity here drives BOTH stacks with per-proposal ids so
the real set-NMS machinery is what's compared.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))
import ref_stack
import ref_train
from test_trained_pipeline_parity import SIZE, YAML, composed_canvas

from mmt_psm_tpu.config import get_cfg
from mmt_psm_tpu.data.synthetic import normalize_image
from mmt_psm_tpu.engine.inference import paste_mask_crop
from mmt_psm_tpu.models import MaskRCNN, ModelConfig
from mmt_psm_tpu.utils.torch_import import apply_to_params, convert_state_dict

N_IMG = 2

pytestmark = pytest.mark.slow

BCE_OPTS = ["MODEL.RELATION_NMS.REG_IOU", "False", "MODEL.RELATION_NMS.REG_IOU_MSK", "False"]
SET_OPTS = [
    "MODEL.RELATION_NMS.USE_RELATION_NMS", "False",
    "MODEL.RELATION_MASK.USE_RELATION", "False",
    "MODEL.ROI_BOX_HEAD.K_HEAD", "2.0",
    "MODEL.ROI_HEADS.NMS_TYPE", "set",
]


@pytest.fixture(scope="module")
def ref():
    return ref_stack.load_reference()


@pytest.fixture(scope="module")
def trained_sd(ref):
    # same recipe as test_trained_pipeline_parity -> shared disk cache;
    # the training-time relation loss flag doesn't change any shapes
    cfg = ref.make_cfg(YAML, ["MODEL.RELATION_NMS.REG_IOU", "True",
                              "MODEL.RELATION_NMS.REG_IOU_MSK", "False"])
    return ref_train.trained_reference_sd(ref, cfg)


@pytest.fixture(scope="module")
def canvases():
    rng = np.random.default_rng(43)
    return np.stack([normalize_image(composed_canvas(rng)) for _ in range(N_IMG)])


def _jax_model(opts):
    ycfg = get_cfg()
    ycfg.merge_from_file(YAML)
    ycfg.merge_from_list(
        opts + ["TPU.IMAGE_SIZE", str(SIZE), "TPU.COMPUTE_DTYPE", "float32"]
    )
    mycfg = ModelConfig.from_cfg(ycfg, train=False)
    return MaskRCNN(config=mycfg), mycfg


def _import_params(model_j, sd, images):
    sizes = jnp.asarray([[SIZE, SIZE]], jnp.int32)
    variables = jax.jit(
        lambda: model_j.init(
            {"params": jax.random.PRNGKey(0)}, images[:1], sizes, train=False
        )
    )()
    flat = convert_state_dict({k: v.detach().numpy() for k, v in sd.items()})
    params, report = apply_to_params(variables["params"], flat)
    assert not report["mismatched"], report["mismatched"][:5]
    return params, sizes


# ---------------------------------------------------------------------------
# REG_IOU=False: BCE relation branch, trained regime
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bce_stacks(ref, trained_sd, canvases):
    cfg = ref.make_cfg(YAML, BCE_OPTS)
    model_t = ref.GeneralizedRCNN(cfg)
    model_t.load_state_dict(trained_sd)
    model_t.eval()

    ref_out = []
    with torch.no_grad():
        for i in range(N_IMG):
            il = ref.to_image_list(
                [torch.as_tensor(np.transpose(canvases[i], (2, 0, 1)))], 32
            )
            ref_out.extend(model_t(il))

    model_j, mycfg = _jax_model(BCE_OPTS)
    assert mycfg.with_relation_nms and not mycfg.relation.reg_iou
    images = jnp.asarray(canvases)
    params, sizes = _import_params(model_j, trained_sd, images)
    fwd = jax.jit(lambda p, im: model_j.apply({"params": p}, im, sizes, train=False))
    dets = [
        jax.tree_util.tree_map(np.asarray, fwd(params, images[i : i + 1]))
        for i in range(N_IMG)
    ]
    return {"ref_out": ref_out, "dets": dets}


def _pairs(bl, dets):
    rs = bl.get_field("scores").numpy()
    v = dets.valid[0].astype(bool)
    ms = dets.scores[0][v]
    assert len(rs) == len(ms)
    return v, list(zip(np.argsort(-rs), np.argsort(-ms)))


def test_bce_trained_regime(bce_stacks):
    """Trained-score regime + the sigmoid merge actually producing
    detections on the BCE branch."""
    n_all = [len(bl) for bl in bce_stacks["ref_out"]]
    assert sum(n_all) > 10, n_all


def test_bce_counts_and_boxes_match(bce_stacks):
    for i in range(N_IMG):
        bl = bce_stacks["ref_out"][i]
        dets = bce_stacks["dets"][i]
        assert len(bl) == int(dets.valid[0].sum()), (i, len(bl), int(dets.valid[0].sum()))
        v, pairs = _pairs(bl, dets)
        rb = bl.bbox.numpy()
        rs = bl.get_field("scores").numpy()
        rl = bl.get_field("labels").numpy()
        mb, ms, ml = dets.boxes[0][v], dets.scores[0][v], dets.labels[0][v]
        for a, b in pairs:
            np.testing.assert_allclose(rb[a], mb[b], atol=5e-3)
            assert abs(float(rs[a]) - float(ms[b])) < 2e-3
            assert int(rl[a]) == int(ml[b])


def test_bce_pasted_bitmasks_identical(bce_stacks):
    from maskrcnn_benchmark.modeling.roi_heads.mask_head.inference import Masker

    masker = Masker(threshold=0.5, padding=1)
    for i in range(N_IMG):
        bl = bce_stacks["ref_out"][i]
        dets = bce_stacks["dets"][i]
        v, pairs = _pairs(bl, dets)
        ref_paste = masker([bl.get_field("mask")], [bl])[0].numpy()
        mb, mm = dets.boxes[0][v], dets.masks[0][v]
        for a, b in pairs:
            canvas = np.zeros((SIZE, SIZE), bool)
            out = paste_mask_crop(mm[b], mb[b], SIZE, SIZE)
            if out is not None:
                crop, (x0, y0, x1, y1) = out
                canvas[y0 : y1 + 1, x0 : x1 + 1] = crop
            assert int((canvas != (ref_paste[a, 0] > 0)).sum()) == 0, (i, a)


# ---------------------------------------------------------------------------
# K_HEAD=2 set-NMS: box post-processor branch, trained regime
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def set_stacks(ref, trained_sd, canvases):
    cfg = ref.make_cfg(YAML, SET_OPTS)
    model_t = ref.GeneralizedRCNN(cfg)
    model_t.load_state_dict(trained_sd, strict=False)  # no relation heads
    model_t.eval()

    ref_dets, ref_degenerate = [], []
    with torch.no_grad():
        for i in range(N_IMG):
            il = ref.to_image_list(
                [torch.as_tensor(np.transpose(canvases[i], (2, 0, 1)))], 32
            )
            feats = model_t.backbone(il.tensors)
            props, _ = model_t.rpn(il, feats)
            bh = model_t.box_heads.box
            x = bh.feature_extractor(feats, props, istrain=False)
            class_logits, box_regression = bh.predictor(x)
            # per-proposal head ids: the non-degenerate set-NMS drive
            head_id = torch.arange(len(props[0]), dtype=torch.float32)
            ref_dets.extend(
                bh.post_processor((class_logits, box_regression), props, head_id)
            )
            # the shipped callsite's behavior (head_id None -> zeros)
            ref_degenerate.extend(
                bh.post_processor((class_logits, box_regression), props)
            )

    model_j, mycfg = _jax_model(SET_OPTS)
    assert not mycfg.with_relation_nms and mycfg.nms_type == "set"
    images = jnp.asarray(canvases)
    params, sizes = _import_params(model_j, trained_sd, images)

    from mmt_psm_tpu.models.box_head import set_nms_filter

    fwd = jax.jit(lambda p, im: model_j.apply({"params": p}, im, sizes, train=False))
    dets = []
    for i in range(N_IMG):
        d = jax.tree_util.tree_map(np.asarray, fwd(params, images[i : i + 1]))
        assert d.head_ids is not None
        v = set_nms_filter(
            d.boxes[0], d.scores[0], d.labels[0], d.valid[0].astype(bool),
            d.head_ids[0], nms_thresh=mycfg.nms_thresh,
        )
        dets.append((d, v))
    return {"ref_dets": ref_dets, "ref_degenerate": ref_degenerate, "dets": dets}


def test_set_nms_shipped_callsite_is_degenerate(set_stacks):
    """With head_id zero-filled (the shipped callsite), the reference's
    set-NMS keep loop resurrects every overlapping same-id box, so NO
    box is suppressed relative to pure threshold+cap. This is the
    recorded justification for tagging per-proposal ids instead."""
    for i in range(N_IMG):
        n_deg = len(set_stacks["ref_degenerate"][i])
        n_set = len(set_stacks["ref_dets"][i])
        assert n_deg >= n_set, (i, n_deg, n_set)
        # degenerate == threshold-only count (no NMS suppressions): must
        # be strictly more boxes than the real set-NMS whenever the
        # trained model produces overlapping cross-proposal duplicates
    assert sum(len(b) for b in set_stacks["ref_degenerate"]) > sum(
        len(b) for b in set_stacks["ref_dets"]
    )


def test_set_nms_counts_match(set_stacks):
    for i in range(N_IMG):
        bl = set_stacks["ref_dets"][i]
        d, v = set_stacks["dets"][i]
        assert len(bl) == int(v.sum()), (i, len(bl), int(v.sum()))


def test_set_nms_boxes_scores_labels_match(set_stacks):
    for i in range(N_IMG):
        bl = set_stacks["ref_dets"][i]
        d, v = set_stacks["dets"][i]
        rb = bl.bbox.numpy()
        rs = bl.get_field("scores").numpy()
        rl = bl.get_field("labels").numpy()
        mb, ms, ml = d.boxes[0][v], d.scores[0][v], d.labels[0][v]
        for a, b in zip(np.argsort(-rs), np.argsort(-ms)):
            np.testing.assert_allclose(rb[a], mb[b], atol=5e-3)
            assert abs(float(rs[a]) - float(ms[b])) < 2e-3
            assert int(rl[a]) == int(ml[b])
