import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.config import get_cfg
from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
from mmt_psm_tpu.models import MaskRCNN, ModelConfig
from mmt_psm_tpu.train.mt_step import (
    MTConfig,
    make_mt_step,
    mgd_loss,
    mt_loss_weight,
    psm_loss,
    weight_sum_losses,
)
from mmt_psm_tpu.train.optim import make_optimizer
from mmt_psm_tpu.train.supervised import create_train_state

from test_detector import _batch


def _np_weight(step, mt):
    """Transliteration of reference weight_sum_losses (MTtrainer.py:89-94)."""
    import math

    if (step - mt.start_mt) < mt.rampup_step and (step - mt.start_mt) > 0:
        cur = np.clip(step - mt.start_mt, 0, mt.rampup_step)
        return mt.lambda_ * math.exp(-5.0 * (1 - cur / mt.rampup_step) ** 2)
    elif (mt.max_iter - step) < mt.rampdown_step:
        return mt.lambda_ * math.exp(-12.0 * (1 - (mt.max_iter - step) / mt.rampup_step) ** 2)
    return mt.lambda_


def test_mt_loss_weight_matches_reference_formula():
    mt = MTConfig(lambda_=5.0, rampup_step=250, rampdown_step=250, start_mt=1000, max_iter=7000)
    for step in [0, 500, 1001, 1100, 1249, 1300, 5000, 6800, 6999]:
        got = float(mt_loss_weight(jnp.asarray(step), mt))
        want = _np_weight(step, mt)
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=str(step))


def test_weight_sum_losses_gating():
    mt = MTConfig(lambda_=5.0, cls_loss_weight=0.2, fg_hint=1.0, start_mt=100, rampup_step=10, rampdown_step=10, max_iter=10000)
    losses = {"loss_classifier": jnp.asarray(1.0), "mt_classifier": jnp.asarray(1.0), "mt_fg_loss": jnp.asarray(1.0)}
    out = weight_sum_losses(losses, jnp.asarray(5000), mt)
    np.testing.assert_allclose(float(out["loss_classifier"]), 1.0)
    np.testing.assert_allclose(float(out["mt_classifier"]), 5.0 * 0.2, rtol=1e-6)
    np.testing.assert_allclose(float(out["mt_fg_loss"]), 5.0 * 1.0, rtol=1e-6)


def test_psm_loss_selection_and_scale():
    mt = MTConfig(sharpen=True, temp=0.5, hard_neg=True, cls_balance_weight=1.5)
    n, c = 12, 3
    rng = np.random.default_rng(0)
    labels = np.zeros((1, n), np.int32)
    labels[0, :4] = 1  # 4 positives -> keep 2 hard negatives
    valid = np.ones((1, n), bool)
    t_views = [jnp.asarray(rng.normal(0, 1, (1, n, c)).astype(np.float32)) for _ in range(4)]
    s_views = [jnp.asarray(rng.normal(0, 1, (1, n, c)).astype(np.float32))]
    loss = float(psm_loss(s_views, t_views, jnp.asarray(labels), jnp.asarray(valid), mt, c))
    assert np.isfinite(loss) and loss > 0

    # teacher == student logits, sharpened target still differs from onehot
    s_same = [t_views[0]]
    loss_same = float(psm_loss(s_same, [t_views[0]] * 4, jnp.asarray(labels), jnp.asarray(valid), mt, c))
    assert loss_same < loss * 3  # consistent student scores lower


def test_psm_loss_zero_when_no_positives():
    mt = MTConfig()
    labels = jnp.zeros((1, 8), jnp.int32)
    valid = jnp.zeros((1, 8), bool)  # nothing valid -> nothing selected
    t = [jnp.ones((1, 8, 3))] * 2
    s = [jnp.ones((1, 8, 3))]
    loss = float(psm_loss(s, t, labels, valid, mt, 3))
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)


def test_mgd_loss_flip_consistency():
    mt = MTConfig()
    rng = np.random.default_rng(1)
    # one level, B=1, 8x8, D=2
    t0 = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 2)).astype(np.float32))
    t1 = jnp.flip(t0, axis=-2)  # "flipped view" — unflipped inside the loss
    canvas = jnp.ones((1, 16, 16))  # full-foreground at stride-matched size
    s = [(t0,)]
    loss = float(mgd_loss([(t0,), (t1,)], s, canvas, mt))
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)

    s_bad = [(t0 + 1.0,)]
    loss_bad = float(mgd_loss([(t0,), (t1,)], s_bad, canvas, mt))
    np.testing.assert_allclose(loss_bad, 1.0, rtol=1e-4)  # MSE of constant 1 offset


@pytest.mark.slow
def test_full_mt_step():
    cfg_model = ModelConfig(
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
        with_hint_adaptor=True,
    )
    model = MaskRCNN(config=cfg_model)
    images, sizes, gt = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, method=model.init_all,
    )["params"]

    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 1e-5
    tx, _ = make_optimizer(cfg, params)
    state = create_train_state(params, tx, with_teacher=True)
    state = state.replace(step=jnp.asarray(1001, jnp.int32))  # past START_MT

    mt = MTConfig(start_mt=1000, aug_k=2, aug_s=1)
    step = jax.jit(make_mt_step(model, tx, mt))

    labeled = {
        "image": images, "image_size": sizes, "boxes": gt.boxes,
        "labels": gt.labels, "gt_valid": gt.valid, "masks": gt.masks,
    }
    b = generate_batch(5, 2, image_size=128, max_instances=16)
    base = normalize_image(b["image"])
    rngn = np.random.default_rng(3)
    t_imgs = np.stack([base + rngn.normal(0, 4, base.shape) for _ in range(2)], axis=1)
    s_imgs = np.stack([base + rngn.normal(0, 4, base.shape)], axis=1)
    unlabeled = {
        "t_images": jnp.asarray(t_imgs, jnp.float32),
        "s_images": jnp.asarray(s_imgs, jnp.float32),
        "image_size": jnp.asarray(b["image_size"]),
    }

    new_state, metrics = step(state, labeled, unlabeled, jax.random.PRNGKey(9))
    assert "mt_classifier" in metrics and "mt_fg_loss" in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # teacher moved (EMA active past START_MT-10)
    t0 = np.asarray(state.teacher_params["box_extractor"]["fc6"]["kernel"])
    t1 = np.asarray(new_state.teacher_params["box_extractor"]["fc6"]["kernel"])
    assert np.abs(t1 - t0).max() > 0
