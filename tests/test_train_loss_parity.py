"""Composed supervised TRAIN-LOSS parity vs the torch reference
(VERDICT r3 item 7).

Module-level goldens cover every loss individually; this test covers
their COMPOSITION through proposal-selection -> subsample -> feature
extraction -> loss (reference box_head/loss.py:82-162, rpn/loss.py:
138-196, mask_head/loss.py, generalized_rcnn.py:63-95's nms_loss) on
one labeled batch through BOTH full stacks.

Matched sampling: the reference samples anchors/RoIs with torch RNG and
this repo with JAX RNG, so the suites can only agree when sampling is
degenerate — both samplers are put in the ALL-TAKE regime
(BATCH_SIZE_PER_IMAGE >= candidates, POSITIVE_FRACTION = 1.0: the
balanced sampler then keeps every non-ignored candidate on both sides,
reference balanced_positive_negative_sampler.py:30-55). Sampling order
still differs, but every compared loss is a sampled-set sum/mean, so
order cancels. FPN_POST_NMS_TOP_N_TRAIN is lowered to 128 so the
all-take RoI budget stays small enough for the CPU mask head.

GT geometry is polygon-canonical: each synthetic instance's mask is
converted to polygons once; the reference consumes the polygons
(SegmentationMask) and this repo consumes their rasterization, so both
stacks see identical ground truth. Mask TARGETS still differ by
projection method — the reference rasterizes cropped polygons at RxR
(segmentation_mask.py:127-137) while this repo bilinear-samples the
dense mask (models/mask_head.py:crop_masks_to_boxes) — so loss_seg
carries a boundary-pixel tolerance, asserted alongside a direct
target-agreement bound; the other five losses match tightly.
"""

import dataclasses
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
from mmt_psm_tpu.data.coco import rasterize_polygons
from mmt_psm_tpu.data.synthetic import generate_sample, normalize_image
from mmt_psm_tpu.models import MaskRCNN, ModelConfig
from mmt_psm_tpu.structures.detections import GroundTruth
from mmt_psm_tpu.utils.segms import mask_to_polygons
from mmt_psm_tpu.utils.torch_import import apply_to_params, convert_state_dict

YAML = "/root/reference/configs/pap/e2e_mask_rcnn_R_50_FPN_1x.yaml"
SIZE = 256
N_IMG = 2
MAX_GT = 16
# 256px FPN anchor grid: 3 * (64^2 + 32^2 + 16^2 + 8^2 + 4^2) = 16368
OPTS = [
    "MODEL.RELATION_NMS.REG_IOU", "True",
    "MODEL.RELATION_NMS.REG_IOU_MSK", "False",
    "MODEL.RPN.BATCH_SIZE_PER_IMAGE", "16384",
    "MODEL.RPN.POSITIVE_FRACTION", "1.0",
    "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "256",
    "MODEL.ROI_HEADS.POSITIVE_FRACTION", "1.0",
    "MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN", "128",
]

pytestmark = pytest.mark.slow


def _shared_batch():
    """Polygon-canonical synthetic batch both stacks consume."""
    rng = np.random.default_rng(3)
    images, per_img = [], []
    for _ in range(N_IMG):
        s = generate_sample(rng, image_size=SIZE, max_instances=MAX_GT, num_cells=(4, 7))
        inst = []
        for i in range(len(s.valid)):
            if not s.valid[i]:
                continue
            polys = mask_to_polygons(s.masks[i])
            if not polys:
                continue
            dense = rasterize_polygons(polys, SIZE, SIZE)
            if dense.sum() < 8:
                continue
            inst.append((s.boxes[i], int(s.labels[i]), polys, dense))
        assert 4 <= len(inst) <= MAX_GT
        images.append(normalize_image(s.image))
        per_img.append(inst)
    return np.stack(images), per_img


def _ref_losses(ref, cfg, sd, images, per_img):
    from maskrcnn_benchmark.structures.segmentation_mask import SegmentationMask

    ref_train.fill_pycoco_stub()
    model = ref.GeneralizedRCNN(cfg)
    model.load_state_dict(sd)
    model.train()
    targets = []
    for inst in per_img:
        boxes = torch.as_tensor(np.asarray([b for b, _, _, _ in inst], np.float32))
        t = ref.BoxList(boxes, (SIZE, SIZE), mode="xyxy")
        t.add_field("labels", torch.as_tensor([l for _, l, _, _ in inst], dtype=torch.int64))
        t.add_field("masks", SegmentationMask([p for _, _, p, _ in inst], (SIZE, SIZE)))
        targets.append(t)
    il = ref.to_image_list(
        [torch.as_tensor(np.transpose(im, (2, 0, 1))) for im in images], 32
    )
    with torch.no_grad():
        losses = model(il, targets)
    return {k: float(v.detach()) for k, v in losses.items()}


def _jax_losses(ycfg, sd, images, per_img):
    mycfg = ModelConfig.from_cfg(ycfg, train=True)
    assert mycfg.with_relation_nms and mycfg.box_positive_fraction == 1.0
    # all positives must reach the mask head (the reference's
    # keep_only_positive_boxes has no cap, mask_head.py:15-36)
    mycfg = dataclasses.replace(mycfg, mask_max_pos=mycfg.box_batch_per_image)
    model = MaskRCNN(config=mycfg)

    boxes = np.zeros((N_IMG, MAX_GT, 4), np.float32)
    labels = np.zeros((N_IMG, MAX_GT), np.int32)
    valid = np.zeros((N_IMG, MAX_GT), bool)
    masks = np.zeros((N_IMG, MAX_GT, SIZE, SIZE), np.float32)
    for i, inst in enumerate(per_img):
        for j, (b, l, _, dense) in enumerate(inst):
            boxes[i, j] = b
            labels[i, j] = l
            valid[i, j] = True
            masks[i, j] = dense
    gt = GroundTruth(
        boxes=jnp.asarray(boxes), labels=jnp.asarray(labels),
        valid=jnp.asarray(valid), masks=jnp.asarray(masks),
    )
    jimages = jnp.asarray(images)
    sizes = jnp.asarray([[SIZE, SIZE]] * N_IMG, jnp.int32)

    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(
        lambda: model.init(rngs, jimages, sizes, gt, train=True)
    )()
    flat = convert_state_dict({k: v.detach().numpy() for k, v in sd.items()})
    params, report = apply_to_params(variables["params"], flat)
    assert not report["mismatched"], report["mismatched"][:5]

    losses = jax.jit(
        lambda p: model.apply(
            {"params": p}, jimages, sizes, gt, train=True,
            rngs={"sample": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
        )
    )(params)
    return {k: float(v) for k, v in losses.items()}


@pytest.fixture(scope="module")
def loss_dicts():
    ref = ref_stack.load_reference()
    cfg = ref.make_cfg(YAML, OPTS)
    torch.manual_seed(0)
    sd = ref.GeneralizedRCNN(cfg).state_dict()

    images, per_img = _shared_batch()
    ref_losses = _ref_losses(ref, cfg, sd, images, per_img)

    ycfg = get_cfg()
    ycfg.merge_from_file(YAML)
    ycfg.merge_from_list(
        OPTS + ["TPU.IMAGE_SIZE", str(SIZE), "TPU.COMPUTE_DTYPE", "float32",
                "TPU.MAX_GT", str(MAX_GT)]
    )
    jax_losses = _jax_losses(ycfg, sd, images, per_img)
    print("ref:", ref_losses)
    print("jax:", jax_losses)
    return ref_losses, jax_losses


# my-key -> reference-key
KEYMAP = {
    "loss_objectness": "loss_objectness",
    "loss_rpn_box_reg": "loss_rpn_box_reg",
    "loss_classifier": "loss_classifier",
    "loss_box_reg": "loss_box_reg",
    "nms_loss": "nms_loss",
    "loss_mask": "loss_seg",
}


def test_all_loss_keys_present(loss_dicts):
    ref_losses, jax_losses = loss_dicts
    assert set(KEYMAP.values()) == set(ref_losses)
    assert set(KEYMAP) == set(jax_losses)


@pytest.mark.parametrize(
    "key", ["loss_objectness", "loss_rpn_box_reg", "loss_classifier", "loss_box_reg", "nms_loss"]
)
def test_loss_parity_tight(loss_dicts, key):
    ref_losses, jax_losses = loss_dicts
    r, m = ref_losses[KEYMAP[key]], jax_losses[key]
    np.testing.assert_allclose(m, r, rtol=1e-4, atol=1e-6, err_msg=key)


def test_mask_loss_parity(loss_dicts):
    """loss_seg tolerance is set by the target-projection method gap
    (polygon-raster vs bilinear-dense, see module docstring; measured
    directly by test_mask_target_projection_gap), not by the model
    composition — the logits feeding both losses go through the same
    pooling/conv/deconv stack whose parity the tight keys above and the
    module goldens already pin. Observed gap: 5.2% at random-init logit
    scale (jax 14.001 vs ref 13.306)."""
    ref_losses, jax_losses = loss_dicts
    r, m = ref_losses["loss_seg"], jax_losses["loss_mask"]
    np.testing.assert_allclose(m, r, rtol=0.08, err_msg=f"ref {r} vs jax {m}")


def test_mask_target_projection_gap():
    """Direct measurement of the ONLY unpinned term in the mask-loss
    comparison: project each GT instance into its own box with both
    stacks' target makers — the reference's polygon crop/scale/raster
    (segmentation_mask.py:127-137 via Polygons.convert) and this repo's
    bilinear dense crop (models/mask_head.py:crop_masks_to_boxes) — and
    bound their pixel disagreement. Boundary pixels at 28x28 dominate;
    interiors must agree exactly."""
    ref_stack.load_reference()  # installs the pycocotools stub modules
    ref_train.fill_pycoco_stub()
    from maskrcnn_benchmark.structures.segmentation_mask import Polygons

    from mmt_psm_tpu.models.mask_head import crop_masks_to_boxes

    _, per_img = _shared_batch()
    R = 28
    diffs = []
    for inst in per_img:
        for b, _, polys, dense in inst:
            pg = Polygons(polys, (SIZE, SIZE), mode=None)
            t_ref = (
                pg.crop([float(x) for x in b]).resize((R, R)).convert("mask").numpy()
            )
            t_mine = np.asarray(
                crop_masks_to_boxes(jnp.asarray(dense[None], jnp.float32),
                                    jnp.asarray(np.asarray(b, np.float32)[None]), R)
            )[0]
            diffs.append(float(np.mean(t_ref.astype(bool) != (t_mine > 0.5))))
    mean_gap = float(np.mean(diffs))
    max_gap = float(np.max(diffs))
    # measured: the two projections disagree only on a thin boundary
    # band; anything beyond ~15% of pixels would mean a geometry bug,
    # not a rasterization-method difference
    assert mean_gap < 0.10, (mean_gap, max_gap)
    assert max_gap < 0.20, (mean_gap, max_gap)
