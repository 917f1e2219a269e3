import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.config import get_cfg
from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
from mmt_psm_tpu.models import MaskRCNN, ModelConfig
from mmt_psm_tpu.structures.detections import GroundTruth
from mmt_psm_tpu.train.ema import ema_update
from mmt_psm_tpu.train.optim import make_optimizer, trainable_mask, warmup_multistep_schedule
from mmt_psm_tpu.train.supervised import create_train_state, make_supervised_step

from test_detector import TINY, _batch


def test_warmup_multistep_schedule():
    sched = warmup_multistep_schedule(0.01, (100, 200), gamma=0.1, warmup_factor=1.0 / 3, warmup_iters=10)
    np.testing.assert_allclose(float(sched(0)), 0.01 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(5)), 0.01 * (1 / 3 * 0.5 + 0.5), rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(150)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(250)), 0.0001, rtol=1e-6)


def test_trainable_mask_rules():
    params = {
        "backbone": {
            "body": {
                "stem": {"conv1": {"kernel": 1}, "bn1": {"weight": 1, "running_var": 1}},
                "layer1_0": {"conv1": {"kernel": 1}},
                "layer3_2": {"conv2": {"kernel": 1}, "bn2": {"weight": 1}},
            },
            "fpn": {"fpn_inner1": {"kernel": 1, "bias": 1}},
        }
    }
    m = trainable_mask(params, freeze_at=2)
    assert m["backbone"]["body"]["stem"]["conv1"]["kernel"] is False
    assert m["backbone"]["body"]["stem"]["bn1"]["weight"] is False
    assert m["backbone"]["body"]["layer1_0"]["conv1"]["kernel"] is False
    assert m["backbone"]["body"]["layer3_2"]["conv2"]["kernel"] is True
    assert m["backbone"]["body"]["layer3_2"]["bn2"]["weight"] is False  # BN always frozen
    assert m["backbone"]["fpn"]["fpn_inner1"]["kernel"] is True


def test_ema_update():
    t = {"w": jnp.ones(3)}
    s = {"w": jnp.zeros(3)}
    # iteration 0 -> alpha = min(0, amax) = 0 -> teacher = student
    out = ema_update(t, s, jnp.asarray(0), 0.99)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0)
    # large iteration -> alpha = 0.99
    out = ema_update(t, s, jnp.asarray(10**6), 0.99)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.99, rtol=1e-5)


def test_supervised_ema_gating():
    """The reference EMAs the teacher only past start_mt - 10, counting
    the EMA iteration from that gate (MTtrainer.py:195-196); a gate of
    None (lambda = 0) never touches the teacher."""
    model = MaskRCNN(config=TINY)
    images, sizes, gt = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, train=True,
    )["params"]
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 5e-5
    cfg.SOLVER.WARMUP_ITERS = 0
    tx, _ = make_optimizer(cfg, params)
    batch = {
        "image": images, "image_size": sizes, "boxes": gt.boxes,
        "labels": gt.labels, "gt_valid": gt.valid, "masks": gt.masks,
    }
    rng = jax.random.PRNGKey(7)
    leaf = lambda p: np.asarray(p["box_extractor"]["fc6"]["kernel"])

    # gate at 2: while state.step <= 2 the teacher stays at init; the
    # call with state.step == 3 is the first to move it
    step = jax.jit(make_supervised_step(model, tx, ema_alpha=0.99, ema_start=2))
    state = create_train_state(params, tx, with_teacher=True)
    for i in range(4):
        state, _ = step(state, batch, rng)
        moved = np.abs(leaf(state.teacher_params) - leaf(params)).max() > 0
        assert moved == (i >= 3), (i, moved)
    # first post-gate update uses ema_iter = 1 -> alpha = 0.5: the
    # teacher snaps halfway to the student in one step
    np.testing.assert_allclose(
        leaf(state.teacher_params),
        0.5 * leaf(params) + 0.5 * leaf(state.params),
        rtol=1e-5, atol=1e-7,
    )

    # no gate (lambda = 0): teacher stays at init forever
    step = jax.jit(make_supervised_step(model, tx, ema_alpha=0.99, ema_start=None))
    state = create_train_state(params, tx, with_teacher=True)
    for _ in range(3):
        state, _ = step(state, batch, rng)
    np.testing.assert_array_equal(leaf(state.teacher_params), leaf(params))


@pytest.mark.slow
def test_supervised_steps_reduce_loss():
    model = MaskRCNN(config=TINY)
    images, sizes, gt = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, train=True,
    )["params"]

    cfg = get_cfg()
    # NB: at random init (identity FrozenBN) the BGR255-mean input keeps
    # a ~50x activation scale through the backbone, so the reference's
    # lr (meant for COCO-pretrained starts, train_mean_teacher.py:41-43)
    # diverges; the smoke test trains at a smaller lr.
    cfg.SOLVER.BASE_LR = 5e-5
    cfg.SOLVER.STEPS = (1000,)
    cfg.SOLVER.WARMUP_ITERS = 0
    tx, _ = make_optimizer(cfg, params)
    state = create_train_state(params, tx, with_teacher=True)
    step = jax.jit(make_supervised_step(model, tx, ema_alpha=0.99, ema_start=0))

    batch = {
        "image": images, "image_size": sizes, "boxes": gt.boxes,
        "labels": gt.labels, "gt_valid": gt.valid, "masks": gt.masks,
    }
    rng = jax.random.PRNGKey(7)
    first = None
    for i in range(10):
        state, metrics = step(state, batch, rng)
        total = float(metrics["loss_total"])
        assert np.isfinite(total)
        if first is None:
            first = total
    assert total < first, (first, total)

    # frozen params unchanged, trainable changed
    stem0 = np.asarray(params["backbone"]["body"]["stem"]["conv1"]["kernel"])
    stem1 = np.asarray(state.params["backbone"]["body"]["stem"]["conv1"]["kernel"])
    np.testing.assert_array_equal(stem0, stem1)
    bn0 = np.asarray(params["backbone"]["body"]["layer3_0"]["bn1"]["weight"])
    bn1 = np.asarray(state.params["backbone"]["body"]["layer3_0"]["bn1"]["weight"])
    np.testing.assert_array_equal(bn0, bn1)
    fc0 = np.asarray(params["box_extractor"]["fc6"]["kernel"])
    fc1 = np.asarray(state.params["box_extractor"]["fc6"]["kernel"])
    assert np.abs(fc0 - fc1).max() > 0

    # teacher EMA trails the student
    t = np.asarray(state.teacher_params["box_extractor"]["fc6"]["kernel"])
    assert np.abs(t - fc1).max() > 0  # not equal to student
    assert np.abs(t - fc0).max() > 0  # but moved off the init
