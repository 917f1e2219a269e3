import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.models.mask_relation import (
    MaskRelationConfig,
    MaskRelationRefineNet,
    _cam_attention,
    _ciam_attention,
)
from mmt_psm_tpu.models import MaskRCNN, ModelConfig
from mmt_psm_tpu.models.relation import RelationNMSConfig

from test_detector import _batch


def test_ciam_gamma_zero_is_identity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (5, 4, 4, 3)).astype(np.float32))
    labels = jnp.asarray([1, 1, 2, 2, 2])
    valid = jnp.ones(5, bool)
    out = _ciam_attention(x, labels, valid, jnp.zeros((1,)), norm=-1, pre_norm=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_ciam_attention_respects_class_blocks():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (4, 2, 2, 2)).astype(np.float32))
    labels = jnp.asarray([1, 1, 2, 2])
    valid = jnp.ones(4, bool)
    gamma = jnp.ones((1,))
    out_full = _ciam_attention(x, labels, valid, gamma, -1, False)
    # perturbing a class-2 instance must not change class-1 outputs
    x2 = x.at[3].add(10.0)
    out_pert = _ciam_attention(x2, labels, valid, gamma, -1, False)
    np.testing.assert_allclose(np.asarray(out_full[:2]), np.asarray(out_pert[:2]), atol=1e-4)
    assert np.abs(np.asarray(out_full[2:]) - np.asarray(out_pert[2:])).max() > 1e-3


def test_cam_gamma_zero_identity():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (3, 4, 4, 8)).astype(np.float32))
    out = _cam_attention(x, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_refine_net_shapes_and_passthrough():
    cfg = MaskRelationConfig()
    net = MaskRelationRefineNet(config=cfg)
    rng = np.random.default_rng(3)
    s = 6
    roi_feats = jnp.asarray(rng.normal(0, 1, (s, 14, 14, 256)).astype(np.float32))
    logits = jnp.asarray(rng.normal(0, 1, (s, 28, 28, 3)).astype(np.float32))
    labels = jnp.asarray([1, 1, 2, 0, 2, 1])
    valid = jnp.asarray([True, True, True, False, True, False])
    params = net.init(jax.random.PRNGKey(0), roi_feats, logits, labels, valid)
    out = net.apply(params, roi_feats, logits, labels, valid)
    assert out.shape == (s, 28, 28, 3)
    # invalid rows keep first-pass logits
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(logits[3]))
    np.testing.assert_allclose(np.asarray(out[5]), np.asarray(logits[5]))


@pytest.mark.slow
def test_detector_with_both_relation_heads():
    cfg = ModelConfig(
        image_size=128,
        pre_nms_top_n_train=128,
        pre_nms_top_n_test=64,
        post_nms_top_n_train=64,
        post_nms_top_n_test=64,
        fpn_post_nms_top_n_train=128,
        fpn_post_nms_top_n_test=64,
        box_batch_per_image=32,
        mask_max_pos=8,
        detections_per_img=16,
        compute_dtype="float32",
        with_relation_nms=True,
        relation=RelationNMSConfig(first_n=16, topk=8, detections_per_img=16),
        with_relation_mask=True,
        relation_mask=MaskRelationConfig(),
    )
    model = MaskRCNN(config=cfg)
    images, sizes, gt = _batch()
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, images, sizes, gt, train=True)
    losses = model.apply(params, images, sizes, gt, train=True, rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)})
    assert "nms_loss" in losses and "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    dets = model.apply(params, images, sizes, train=False)
    assert dets.masks is not None
    assert np.isfinite(np.asarray(dets.masks)).all()
