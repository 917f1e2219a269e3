"""Composed end-to-end parity vs the torch reference on TRAINED weights
at the 1024 flagship canvas (VERDICT r3 item 1).

The random-init parity suite (tests/test_full_pipeline_parity.py) runs
at 224px where class scores are near-uniform, so the score threshold
(0.05), per-class NMS, relation-NMS merge and the 200-cap paths
(reference box_head/inference.py:92-145, relation_module.py:503-601)
are exercised in one narrow score regime and the FPN level mapper
(poolers.py:11-42) barely leaves P2/P3. Here the reference's own
``GeneralizedRCNN`` is briefly TRAINED on CPU (tests/ref_train.py — the
score distribution peaks), the weights imported into this repo's
``MaskRCNN``, and both stacks run over 4 composed 1024px canvases whose
cells span three object scales, covering level-mapper levels up to P5.

Asserts (same contract as the random-init suite):

* identical surviving detection counts per image,
* boxes/scores within tolerance, identical labels,
* 28x28 mask probabilities within tolerance,
* bit-identical pasted bitmasks at threshold 0.5,
* plus the trained-regime guards: peaked scores and boxes mapped to
  FPN levels >= 4.
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

from mmt_psm_tpu.config import get_cfg
from mmt_psm_tpu.data.synthetic import generate_sample, normalize_image
from mmt_psm_tpu.engine.inference import paste_mask_crop
from mmt_psm_tpu.models import MaskRCNN, ModelConfig
from mmt_psm_tpu.utils.torch_import import apply_to_params, convert_state_dict

YAML = "/root/reference/configs/pap/e2e_mask_rcnn_R_50_FPN_1x.yaml"
OPTS = ["MODEL.RELATION_NMS.REG_IOU", "True", "MODEL.RELATION_NMS.REG_IOU_MSK", "False"]
SIZE = 1024
N_IMG = 4

pytestmark = pytest.mark.slow


def composed_canvas(rng) -> np.ndarray:
    """1024px canvas with cells at three object scales: jumbo native-1024
    cells (radius 0.2-0.4 of the canvas -> sqrt(area) 400-800 -> level
    mapper P4/P5 for the proposals they induce), a pasted 512 window
    (P3) and a pasted 256 window (P2/P3)."""
    base = generate_sample(
        rng, image_size=SIZE, num_cells=(2, 3), radius_range=(0.2, 0.4)
    ).image
    med = generate_sample(rng, image_size=512, num_cells=(4, 6)).image
    small = generate_sample(rng, image_size=256, num_cells=(4, 7)).image
    my, mx = rng.integers(0, SIZE - 512, 2)
    base[my : my + 512, mx : mx + 512] = med
    sy, sx = rng.integers(0, SIZE - 256, 2)
    base[sy : sy + 256, sx : sx + 256] = small
    return base


@pytest.fixture(scope="module")
def stacks():
    ref = ref_stack.load_reference()
    cfg = ref.make_cfg(YAML, OPTS)
    sd = ref_train.trained_reference_sd(ref, cfg)
    model_t = ref.GeneralizedRCNN(cfg)
    model_t.load_state_dict(sd)
    model_t.eval()

    rng = np.random.default_rng(42)
    imgs = np.stack([normalize_image(composed_canvas(rng)) for _ in range(N_IMG)])

    ref_out = []
    with torch.no_grad():
        for i in range(N_IMG):  # per-image: bounds CPU peak memory
            il = ref.to_image_list([torch.as_tensor(np.transpose(imgs[i], (2, 0, 1)))], 32)
            ref_out.extend(model_t(il))
    masker = _import_masker()(threshold=0.5, padding=1)
    ref_paste = [masker([bl.get_field("mask")], [bl])[0].numpy() for bl in ref_out]

    ycfg = get_cfg()
    ycfg.merge_from_file(YAML)
    ycfg.merge_from_list(
        OPTS + ["TPU.IMAGE_SIZE", str(SIZE), "TPU.COMPUTE_DTYPE", "float32"]
    )
    mycfg = ModelConfig.from_cfg(ycfg, train=False)
    assert mycfg.with_relation_nms and mycfg.with_relation_mask
    model_j = MaskRCNN(config=mycfg)

    images = jnp.asarray(imgs)
    sizes = jnp.asarray([[SIZE, SIZE]], jnp.int32)
    variables = jax.jit(
        lambda: model_j.init(
            {"params": jax.random.PRNGKey(0)}, images[:1], sizes, train=False
        )
    )()
    flat = convert_state_dict({k: v.detach().numpy() for k, v in sd.items()})
    params, report = apply_to_params(variables["params"], flat)
    unmatched = [
        k for k in flat.get("__unmatched__", []) if "anchor_generator.cell_anchors" not in k
    ]
    assert not unmatched, unmatched[:5]
    assert not report["mismatched"], report["mismatched"][:5]

    fwd = jax.jit(lambda p, im: model_j.apply({"params": p}, im, sizes, train=False))
    dets = [
        jax.tree_util.tree_map(np.asarray, fwd(params, images[i : i + 1]))
        for i in range(N_IMG)
    ]

    # proposal-level FPN coverage: the pooled RoIs in the composed
    # forward are the RPN proposals, whose sizes (not the final
    # detections') drive the level mapper (poolers.py:11-42)
    from mmt_psm_tpu.models import rpn as RPN

    def props(p, im):
        feats = model_j.apply({"params": p}, im, method=model_j.backbone_features)
        obj, reg = model_j.apply({"params": p}, feats, method=model_j.rpn_raw)
        anchors = model_j.apply({"params": p}, method=lambda m: m._anchors())
        return RPN.select_proposals(
            obj, reg, anchors, sizes,
            pre_nms_top_n=mycfg.pre_nms_top_n_test,
            post_nms_top_n=mycfg.post_nms_top_n_test,
            fpn_post_nms_top_n=mycfg.fpn_post_nms_top_n_test,
            nms_thresh=mycfg.rpn_nms_thresh,
            min_size=mycfg.rpn_min_size,
            is_train=False,
        )

    prop_levels = []
    props_jit = jax.jit(props)
    for i in range(N_IMG):
        pr = jax.tree_util.tree_map(np.asarray, props_jit(params, images[i : i + 1]))
        b, v = pr.boxes[0], pr.valid[0].astype(bool)
        wh = b[v]
        sq = np.sqrt(
            np.maximum(wh[:, 2] - wh[:, 0], 0) * np.maximum(wh[:, 3] - wh[:, 1], 0)
        )
        lvl = np.clip(np.floor(4 + np.log2(np.maximum(sq, 1e-6) / 224)), 2, 5)
        prop_levels.append(lvl.astype(int))

    return {
        "ref_out": ref_out,
        "ref_paste": ref_paste,
        "dets": dets,
        "prop_levels": prop_levels,
    }


def _import_masker():
    from maskrcnn_benchmark.modeling.roi_heads.mask_head.inference import Masker

    return Masker


def _pairs(stacks, i):
    bl = stacks["ref_out"][i]
    rs = bl.get_field("scores").numpy()
    dets = stacks["dets"][i]
    v = dets.valid[0].astype(bool)
    ms = dets.scores[0][v]
    assert len(rs) == len(ms)
    return bl, v, list(zip(np.argsort(-rs), np.argsort(-ms)))


def test_trained_regime(stacks):
    """The weights must actually be trained: scores well above the
    random-init softmax band (~0.33-0.4 for 3 classes; the ref_train
    recipe measures smax ~0.5-0.7 on composed 1024 canvases) and a real
    spread across [0.05, smax] so the 0.05 threshold + per-class NMS see
    the shipping regime, not one narrow band."""
    top_scores, n_all = [], []
    for i in range(N_IMG):
        bl = stacks["ref_out"][i]
        s = bl.get_field("scores").numpy()
        n_all.append(len(s))
        assert len(s) > 6, (i, len(s))
        top_scores.append(float(s.max()))
    assert max(top_scores) > 0.55, top_scores
    assert sum(n_all) > 40, n_all


def test_fpn_level_coverage(stacks):
    """The composed forward must pool RoIs from level-mapper levels >= 4
    (poolers.py:11-42: lvl 4 needs sqrt(area) >= 448) — asserted on the
    PROPOSALS (what the box-head pooler actually consumes; the jumbo
    base cells induce them) rather than on the final detections."""
    counts = np.zeros(6, int)
    for lv in stacks["prop_levels"]:
        for k in range(2, 6):
            counts[k] += int((lv == k).sum())
    assert counts[2] > 0 and counts[3] > 0, counts
    assert counts[4] + counts[5] > 0, counts


def test_detection_counts_match(stacks):
    for i in range(N_IMG):
        n_ref = len(stacks["ref_out"][i])
        n_mine = int(stacks["dets"][i].valid[0].sum())
        assert n_ref == n_mine, (i, n_ref, n_mine)


def test_boxes_scores_labels_match(stacks):
    for i in range(N_IMG):
        bl, v, pairs = _pairs(stacks, i)
        dets = stacks["dets"][i]
        rb = bl.bbox.numpy()
        rs = bl.get_field("scores").numpy()
        rl = bl.get_field("labels").numpy()
        mb, ms, ml = dets.boxes[0][v], dets.scores[0][v], dets.labels[0][v]
        for a, b in pairs:
            np.testing.assert_allclose(rb[a], mb[b], atol=5e-3)
            assert abs(float(rs[a]) - float(ms[b])) < 2e-3
            assert int(rl[a]) == int(ml[b])


def test_mask_probs_match(stacks):
    for i in range(N_IMG):
        bl, v, pairs = _pairs(stacks, i)
        rm = bl.get_field("mask").numpy()
        mm = stacks["dets"][i].masks[0][v]
        for a, b in pairs:
            np.testing.assert_allclose(rm[a, 0], mm[b], atol=2e-3)


def test_pasted_bitmasks_identical(stacks):
    for i in range(N_IMG):
        bl, v, pairs = _pairs(stacks, i)
        dets = stacks["dets"][i]
        mb = dets.boxes[0][v]
        mm = dets.masks[0][v]
        ref_paste = stacks["ref_paste"][i]
        total_px = 0
        for a, b in pairs:
            canvas = np.zeros((SIZE, SIZE), bool)
            out = paste_mask_crop(mm[b], mb[b], SIZE, SIZE)
            if out is not None:
                crop, (x0, y0, x1, y1) = out
                canvas[y0 : y1 + 1, x0 : x1 + 1] = crop
            mismatch = int((canvas != (ref_paste[a, 0] > 0)).sum())
            assert mismatch == 0, (i, a, mismatch)
            total_px += int(canvas.sum())
        assert total_px > 0
