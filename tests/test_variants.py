"""Component-variant parity (VERDICT r1 item 10 + §2.3 partial rows):
PRCNN/CSPN baseline mask path, relation-mask extractor variants +
SAME_PREDICTOR, ShapeBuffer, and the PLTRAIN teacher branch.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.models import MaskRCNN
from mmt_psm_tpu.models.mask_head import PRCNNExtractor, PRCNNPredictor
from mmt_psm_tpu.models.mask_relation import (
    MaskRelationConfig,
    MaskRelationRefineNet,
    ShapeBuffer,
)
from mmt_psm_tpu.train.mt_step import MTConfig, gt_integral_canvas, unlabeled_losses

from test_detector import TINY, _batch


def test_prcnn_extractor_shapes():
    """PRCNN: raw image + boxes -> [S, 25, 25, 32] -> logits [S, 25, 25, 3]
    (roi_mask_feature_extractors.py:9-88, roi_mask_predictors.py:39-53)."""
    ex = PRCNNExtractor(dtype=jnp.float32)
    img = jnp.zeros((64, 64, 3), jnp.float32)
    boxes = jnp.asarray([[4, 4, 30, 30], [10, 10, 50, 50]], jnp.float32)
    params = ex.init(jax.random.PRNGKey(0), img, boxes)
    feats = ex.apply(params, img, boxes)
    assert feats.shape == (2, 25, 25, 32)
    # conv tower channel progression 32/64/128/256 + posconvs
    p = params["params"]
    assert p["conv1"]["kernel"].shape == (3, 3, 3, 32)
    assert p["conv8"]["kernel"].shape == (3, 3, 256, 256)
    assert p["posconv1"]["kernel"].shape == (3, 3, 480, 256)
    assert p["posconv2"]["kernel"].shape == (3, 3, 256, 32)

    pr = PRCNNPredictor(num_classes=3)
    pp = pr.init(jax.random.PRNGKey(1), feats)
    logits = pr.apply(pp, feats)
    assert logits.shape == (2, 25, 25, 3)


@pytest.mark.slow
def test_prcnn_model_path():
    model = MaskRCNN(
        config=dataclasses.replace(TINY, mask_extractor="PRCNNFeatureExtractor", mask_resolution=25)
    )
    images, sizes, gt = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, train=True,
    )
    losses = model.apply(
        params, images, sizes, gt, train=True,
        rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    assert np.isfinite(float(losses["loss_mask"]))
    dets = model.apply(params, images, sizes, train=False)
    assert dets.masks.shape[-2:] == (25, 25)


def _relation_inputs(s=6, key=0):
    rng = np.random.default_rng(key)
    roi = jnp.asarray(rng.normal(size=(s, 14, 14, 256)).astype(np.float32))
    logits = jnp.asarray(rng.normal(size=(s, 28, 28, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, 3, s).astype(np.int32))
    valid = jnp.asarray([True] * (s - 1) + [False])
    return roi, logits, labels, valid


@pytest.mark.parametrize(
    "extractor",
    [
        "RoiAlignMaskFeatureExtractor",
        "SameSizeRoiAlignMaskFeatureExtractor",
        "DeepFeatureExtractor",
        "MaskFeatureExtractor",
    ],
)
@pytest.mark.parametrize("att", ["CIAM", "CAM"])
def test_relation_mask_extractor_variants(extractor, att):
    cfg = MaskRelationConfig(type=att, extractor=extractor, extractor_channel=8)
    net = MaskRelationRefineNet(config=cfg)
    roi, logits, labels, valid = _relation_inputs()
    params = net.init(jax.random.PRNGKey(0), roi, logits, labels, valid)
    out = net.apply(params, roi, logits, labels, valid)
    assert out.shape == logits.shape
    # invalid rows keep their first-pass logits
    np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(logits[-1]))
    assert np.isfinite(np.asarray(out)).all()


def test_relation_mask_same_predictor_returns_features():
    """SAME_PREDICTOR routes refined features to the shared predictor
    (mask_relation_module.py:46-51, 97-101)."""
    cfg = MaskRelationConfig(extractor="SameFeatureMask", same_predictor=True)
    net = MaskRelationRefineNet(config=cfg)
    roi, logits, labels, valid = _relation_inputs()
    params = net.init(jax.random.PRNGKey(0), roi, logits, labels, valid)
    feats, keep = net.apply(params, roi, logits, labels, valid)
    assert feats.shape == roi.shape  # passthrough extractor keeps 256ch
    assert keep.shape == (roi.shape[0], 1, 1, 1)
    # no private deconv/classifier params in this mode
    assert "deconv_1" not in params["params"] and "classifier" not in params["params"]


def test_shape_buffer():
    sb = ShapeBuffer(center_per_class=4, resolution=28)
    params = sb.init(jax.random.PRNGKey(0))
    c = sb.apply(params)
    assert c.shape == (8, 28, 28, 1)


def test_gt_integral_canvas():
    masks = np.zeros((1, 3, 16, 16), np.uint8)
    masks[0, 0, :8, :8] = 1
    masks[0, 1, 4:12, 4:12] = 1
    masks[0, 2, :, :] = 1  # invalid instance, must not count
    valid = np.array([[True, True, False]])
    canvas = np.asarray(gt_integral_canvas(jnp.asarray(masks), jnp.asarray(valid), 8))
    assert canvas.shape == (1, 8, 8)
    # nearest-resampled counts: overlap region has 2, elsewhere 0/1
    assert canvas.max() == 2.0
    assert canvas[0, 0, 0] == 1.0  # only instance 0 at the origin
    assert canvas[0, 7, 7] == 0.0  # nothing valid in the bottom-right


@pytest.mark.slow
def test_pltrain_targets_branch():
    """unlabeled_losses with given GT skips teacher inference and still
    produces the consistency losses (generalized_rcnn.py:133-138)."""
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
    from mmt_psm_tpu.structures.detections import GroundTruth

    model = MaskRCNN(config=dataclasses.replace(TINY, with_hint_adaptor=True))
    images, sizes, gt = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, method=model.init_all,
    )["params"]

    b = generate_batch(7, 2, image_size=128, max_instances=16)
    imgs = jnp.asarray(normalize_image(b["image"]))
    batch = {
        "t_images": jnp.stack([imgs, imgs], axis=1),
        "s_images": imgs[:, None],
        "image_size": jnp.asarray(b["image_size"]),
    }
    targets = GroundTruth(
        boxes=jnp.asarray(b["boxes"]),
        labels=jnp.asarray(b["labels"]),
        valid=jnp.asarray(b["gt_valid"]),
        masks=jnp.asarray(b["masks"]),
    )
    mt = MTConfig(pltrain=True, aug_k=2, aug_s=1)
    losses = jax.jit(
        lambda p, bt: unlabeled_losses(model, p, p, bt, jax.random.PRNGKey(5), mt, targets=targets)
    )(params, batch)
    assert set(losses) == {"mt_classifier", "mt_fg_loss"}
    for v in losses.values():
        assert np.isfinite(float(v))


@pytest.mark.slow
def test_component_arm_gating():
    """PSM-only (FG_HINT=0) and MGD-only (CLS_LOSS=0) produce exactly
    their own consistency loss — the decomposition arms of
    scripts/mt_lift_experiment.py (paper Table-2 axis; PSM
    box_head/loss.py:185-237, MGD generalized_rcnn.py:243-282)."""
    from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
    from mmt_psm_tpu.structures.detections import GroundTruth

    model = MaskRCNN(config=dataclasses.replace(TINY, with_hint_adaptor=True))
    images, sizes, gt = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, method=model.init_all,
    )["params"]

    b = generate_batch(7, 2, image_size=128, max_instances=16)
    imgs = jnp.asarray(normalize_image(b["image"]))
    batch = {
        "t_images": jnp.stack([imgs, imgs], axis=1),
        "s_images": imgs[:, None],
        "image_size": jnp.asarray(b["image_size"]),
    }
    targets = GroundTruth(
        boxes=jnp.asarray(b["boxes"]),
        labels=jnp.asarray(b["labels"]),
        valid=jnp.asarray(b["gt_valid"]),
        masks=jnp.asarray(b["masks"]),
    )
    for mt, expect in [
        (MTConfig(pltrain=True, aug_k=2, aug_s=1, fg_hint=0.0), {"mt_classifier"}),
        (MTConfig(pltrain=True, aug_k=2, aug_s=1, cls_loss_weight=0.0), {"mt_fg_loss"}),
    ]:
        losses = jax.jit(
            lambda p, bt, mt=mt: unlabeled_losses(model, p, p, bt, jax.random.PRNGKey(5), mt, targets=targets)
        )(params, batch)
        assert set(losses) == expect, (set(losses), expect)
        for v in losses.values():
            assert np.isfinite(float(v))
