import numpy as np
import jax.numpy as jnp

from mmt_psm_tpu.train.mt_step import (
    boxes_to_canvas,
    ffi_hint_loss,
    naive_hint_loss,
    odkd_loss,
)


def test_odkd_loss_negative_weighting():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(0, 1, (1, 6, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(0, 1, (1, 6, 3)).astype(np.float32))
    labels = jnp.asarray([[1, 1, 0, 0, 0, 0]])
    valid = jnp.ones((1, 6), bool)
    base = float(odkd_loss(s, t, labels, valid, neg_weight=1.0))
    weighted = float(odkd_loss(s, t, labels, valid, neg_weight=1.5))
    assert weighted > base  # negatives upweighted
    # identical student/teacher still has entropy floor > 0
    same = float(odkd_loss(t, t, labels, valid))
    assert np.isfinite(same) and same > 0


def test_boxes_to_canvas():
    boxes = jnp.asarray([[4.0, 4.0, 11.0, 11.0], [0.0, 0.0, 0.0, 0.0]])
    valid = jnp.asarray([True, False])
    canvas = np.asarray(boxes_to_canvas(boxes, valid, 8, 2.0))
    # canvas pixel i covers image coord (i+0.5)*2-0.5 = 2i+0.5
    assert canvas[3, 3] == 1  # coord 6.5 inside [4, 11]
    assert canvas[0, 0] == 0  # coord 0.5 outside; invalid box ignored
    assert canvas.sum() == 16  # 4x4 block (coords 4.5..10.5)


def test_ffi_and_naive_hint():
    rng = np.random.default_rng(1)
    t = [jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32))]
    s_same = [t[0]]
    s_off = [t[0] + 1.0]
    canvas = jnp.zeros((1, 8, 8)).at[:, 2:6, 2:6].set(1.0)
    assert float(ffi_hint_loss(t, s_same, canvas)) == 0.0
    np.testing.assert_allclose(float(ffi_hint_loss(t, s_off, canvas)), 1.0, rtol=1e-5)
    assert float(naive_hint_loss(t, s_same)) == 0.0
    np.testing.assert_allclose(float(naive_hint_loss(t, s_off)), 1.0, rtol=1e-5)


def test_gradient_reversal():
    import jax

    from mmt_psm_tpu.ops.grad_ops import gradient_reversal

    def f(x):
        return jnp.sum(gradient_reversal(x, 2.0) ** 1)

    g = jax.grad(f)(jnp.ones(3))
    np.testing.assert_allclose(np.asarray(g), -2.0)
    # forward is identity
    np.testing.assert_allclose(np.asarray(gradient_reversal(jnp.ones(3), 2.0)), 1.0)
