"""Full R-50-C4 model family (reference default config family:
CONV_BODY=R-50-C4 + ResNet50Conv5ROIFeatureExtractor + shared-extractor
mask head — config/defaults.py:60, 101, 110; backbone builder
modeling/backbone/backbone.py:12-44)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.config import get_cfg
from mmt_psm_tpu.models import MaskRCNN, ModelConfig

from test_detector import _batch

C4_TINY = ModelConfig(
    image_size=128,
    conv_body="R-50-C4",
    anchor_strides=(16,),
    anchor_sizes=(32, 64, 128, 256, 512),
    pooler_scales=(1.0 / 16,),
    box_pooler_resolution=14,
    box_extractor="ResNet50Conv5ROIFeatureExtractor",
    mask_extractor="ResNet50Conv5ROIFeatureExtractor",
    mask_pooler_resolution=14,
    mask_resolution=14,
    pre_nms_top_n_train=256,
    pre_nms_top_n_test=128,
    post_nms_top_n_train=128,
    post_nms_top_n_test=128,
    fpn_post_nms_top_n_train=256,
    fpn_post_nms_top_n_test=128,
    box_batch_per_image=64,
    mask_max_pos=16,
    detections_per_img=32,
    compute_dtype="float32",
)


def test_from_cfg_default_is_c4():
    """The bare default config is the C4 family, like the reference
    (defaults.py:60 CONV_BODY=R-50-C4)."""
    cfg = get_cfg()
    mcfg = ModelConfig.from_cfg(cfg)
    assert mcfg.conv_body == "R-50-C4"
    assert mcfg.box_extractor == "ResNet50Conv5ROIFeatureExtractor"
    assert mcfg.pooler_scales == (1.0 / 16,)
    # the pap yaml selects FPN explicitly
    cfg2 = get_cfg()
    cfg2.merge_from_file("configs/pap/mmt_psm_r50_fpn.yaml")
    assert ModelConfig.from_cfg(cfg2).conv_body == "R-50-FPN"


@pytest.mark.slow
def test_c4_train_and_inference():
    model = MaskRCNN(config=C4_TINY)
    images, sizes, gt = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, train=True,
    )
    # single C4 level; stage-5 box head params present, no FPN modules
    p = params["params"]
    assert "fpn" not in p["backbone"]
    assert "layer4_0" in p["box_extractor"]["head"]
    assert "mask_extractor" not in p  # shared with the box extractor

    losses = model.apply(
        params, images, sizes, gt, train=True,
        rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    for k in ("loss_objectness", "loss_rpn_box_reg", "loss_classifier", "loss_box_reg", "loss_mask"):
        assert np.isfinite(float(losses[k])), k

    dets = model.apply(params, images, sizes, train=False)
    assert dets.boxes.shape == (2, C4_TINY.detections_per_img, 4)
    assert dets.masks.shape[-2:] == (14, 14)
    assert np.isfinite(np.asarray(dets.scores)).all()


@pytest.mark.slow
def test_r101_fpn_builds_deeper_backbone():
    """from_cfg threads CONV_BODY (round-1 silently built R-50 for
    R-101 configs)."""
    cfg = dataclasses.replace(
        C4_TINY, conv_body="R-101-FPN", box_extractor="FPN2MLPFeatureExtractor",
        mask_extractor="MaskRCNNFPNFeatureExtractor",
        anchor_strides=(4, 8, 16, 32, 64),
        pooler_scales=(0.25, 0.125, 0.0625, 0.03125),
        box_pooler_resolution=7, mask_resolution=28,
    )
    model = MaskRCNN(config=cfg)
    images, sizes, gt = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, train=True,
    )
    body = params["params"]["backbone"]["body"]
    assert "layer3_22" in body  # R-101: 23 blocks in stage 3
