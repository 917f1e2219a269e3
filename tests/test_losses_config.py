import numpy as np
import jax.numpy as jnp

from mmt_psm_tpu.config import get_cfg
from mmt_psm_tpu.ops import losses as L


def test_config_loads_reference_yaml():
    cfg = get_cfg()
    cfg.merge_from_file("/root/reference/configs/pap/e2e_mask_rcnn_R_50_FPN_1x.yaml")
    assert cfg.MODEL.BACKBONE.CONV_BODY == "R-50-FPN"
    assert cfg.MODEL.RPN.ANCHOR_STRIDE == (4, 8, 16, 32, 64)
    assert cfg.MODEL.RELATION_NMS.FIRST_N == 90
    assert cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES == (0.25, 0.125, 0.0625, 0.03125)
    assert cfg.SOLVER.MAX_ITER == 7000
    assert cfg.MT.ALPHA == 0.999


def test_config_merge_from_list_and_freeze():
    cfg = get_cfg()
    cfg.merge_from_list(["MT.LAMBDA", "5.", "SOLVER.BASE_LR", "0.005", "MT.HARD_NEG", "True"])
    assert cfg.MT.LAMBDA == 5.0
    assert cfg.SOLVER.BASE_LR == 0.005
    assert cfg.MT.HARD_NEG is True
    cfg.freeze()
    try:
        cfg.MT.LAMBDA = 1.0
        raised = False
    except AttributeError:
        raised = True
    assert raised


def test_smooth_l1_quadratic_and_linear_regions():
    beta = 1.0 / 9
    x = jnp.asarray([0.05, 1.0])
    t = jnp.zeros(2)
    got = np.asarray(L.smooth_l1(x, t, beta=beta, weight=jnp.asarray([1.0, 0.0])))
    np.testing.assert_allclose(got, 0.5 * 0.05**2 / beta, rtol=1e-5)
    got2 = np.asarray(L.smooth_l1(x, t, beta=beta, weight=jnp.asarray([0.0, 1.0])))
    np.testing.assert_allclose(got2, 1.0 - 0.5 * beta, rtol=1e-5)


def test_soft_ce_equals_hard_ce_on_onehot():
    logits = jnp.asarray([[2.0, -1.0, 0.5], [0.1, 3.0, -2.0]])
    labels = jnp.asarray([0, 1])
    onehot = jnp.eye(3)[labels]
    np.testing.assert_allclose(
        float(L.soft_ce(logits, onehot)), float(L.softmax_ce(logits, labels)), rtol=1e-6
    )


def test_sharpen_temperature():
    p = jnp.asarray([[0.6, 0.3, 0.1]])
    s = np.asarray(L.sharpen(p, 0.5))
    assert s[0, 0] > 0.6  # sharpening increases the mode
    np.testing.assert_allclose(s.sum(), 1.0, rtol=1e-6)


def test_masked_losses_ignore_padding():
    logits = jnp.asarray([[1.0, 2.0], [100.0, -100.0]])
    labels = jnp.asarray([1, 0])
    w = jnp.asarray([1.0, 0.0])
    full = float(L.softmax_ce(logits[:1], labels[:1]))
    masked = float(L.softmax_ce(logits, labels, weight=w))
    np.testing.assert_allclose(masked, full, rtol=1e-6)


def test_dice_loss_perfect_prediction():
    m = jnp.ones((2, 8, 8))
    assert float(L.dice_loss(m, m)) < 1e-3


def test_focal_loss_downweights_easy():
    logits = jnp.asarray([5.0])
    t = jnp.asarray([1.0])
    easy = float(L.sigmoid_focal_loss(logits, t))
    hard = float(L.sigmoid_focal_loss(-logits, t))
    assert hard > 100 * easy
