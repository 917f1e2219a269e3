"""Every reference YAML loads; one tiny model per config family runs.

The reference ships 24 configs across pap / caffe2 / cityscapes /
pascal_voc / quick_schedules (reference: configs/). All of them must
merge into our config tree and produce a ModelConfig; one representative
per distinct graph family is instantiated at toy size and run
(train losses + inference)."""

import dataclasses
import glob

import numpy as np
import jax
import pytest

from mmt_psm_tpu.config import get_cfg
from mmt_psm_tpu.models import MaskRCNN, ModelConfig

from test_detector import _batch

REF_CONFIGS = sorted(glob.glob("/root/reference/configs/**/*.yaml", recursive=True))

TOY = dict(
    image_size=128,
    pre_nms_top_n_train=256,
    pre_nms_top_n_test=128,
    post_nms_top_n_train=128,
    post_nms_top_n_test=128,
    fpn_post_nms_top_n_train=256,
    fpn_post_nms_top_n_test=128,
    box_batch_per_image=64,
    mask_max_pos=8,
    detections_per_img=32,
    compute_dtype="float32",
    num_classes=3,
)


def test_all_reference_yamls_load():
    assert len(REF_CONFIGS) >= 20
    for path in REF_CONFIGS:
        cfg = get_cfg()
        cfg.merge_from_file(path)
        ModelConfig.from_cfg(cfg)


def _toyify(mcfg: ModelConfig) -> ModelConfig:
    over = dict(TOY)
    if mcfg.conv_body.endswith("-C4"):
        over["mask_resolution"] = 14
    # X-101 isn't a supported conv body (grouped resnext) — map to R-101
    if "X-101" in mcfg.conv_body or "X_101" in mcfg.conv_body:
        over["conv_body"] = mcfg.conv_body.replace("X-101-32x8d", "R-101")
    return dataclasses.replace(mcfg, **over)


@pytest.mark.slow
@pytest.mark.parametrize(
    "path",
    [
        "/root/reference/configs/quick_schedules/rpn_R_50_FPN_quick.yaml",
        "/root/reference/configs/quick_schedules/e2e_faster_rcnn_R_50_C4_quick.yaml",
        "/root/reference/configs/pap/CSPN.yaml",
    ],
    ids=["rpn-only-fpn", "faster-c4", "cspn"],
)
def test_reference_config_family_runs(path):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    mcfg = _toyify(ModelConfig.from_cfg(cfg))
    model = MaskRCNN(config=mcfg)
    images, sizes, gt = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, train=True,
    )
    losses = model.apply(
        params, images, sizes, gt, train=True,
        rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    assert all(np.isfinite(float(v)) for v in losses.values()), losses
    if mcfg.rpn_only:
        assert set(losses) == {"loss_objectness", "loss_rpn_box_reg"}
    dets = model.apply(params, images, sizes, train=False)
    assert np.isfinite(np.asarray(dets.scores)).all()
    if mcfg.rpn_only:
        # proposals in decreasing objectness order, all labeled fg
        s = np.asarray(dets.scores[0])
        v = np.asarray(dets.valid[0])
        sv = s[v]
        assert (np.diff(sv) <= 1e-6).all()
        assert (np.asarray(dets.labels[0])[v] == 1).all()
        assert dets.masks is None
