import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
from mmt_psm_tpu.models import MaskRCNN, ModelConfig
from mmt_psm_tpu.structures.detections import GroundTruth

TINY = ModelConfig(
    image_size=128,
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


def _batch(bsz=2, image_size=128, max_inst=16):
    b = generate_batch(0, bsz, image_size=image_size, max_instances=max_inst)
    images = jnp.asarray(normalize_image(b["image"]))
    gt = GroundTruth(
        boxes=jnp.asarray(b["boxes"]),
        labels=jnp.asarray(b["labels"]),
        valid=jnp.asarray(b["gt_valid"]),
        masks=jnp.asarray(b["masks"]),
    )
    sizes = jnp.asarray(b["image_size"])
    return images, sizes, gt


@pytest.fixture(scope="module")
def model_and_params():
    model = MaskRCNN(config=TINY)
    images, sizes, gt = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images,
        sizes,
        gt,
        train=True,
    )
    return model, params


@pytest.mark.slow
def test_train_losses_finite(model_and_params):
    model, params = model_and_params
    images, sizes, gt = _batch()
    losses = model.apply(
        params,
        images,
        sizes,
        gt,
        train=True,
        rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    expected = {"loss_objectness", "loss_rpn_box_reg", "loss_classifier", "loss_box_reg", "loss_mask"}
    assert set(losses) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
        assert float(v) >= 0, (k, v)


@pytest.mark.slow
def test_inference_shapes_and_validity(model_and_params):
    model, params = model_and_params
    images, sizes, _ = _batch()
    dets = model.apply(params, images, sizes, train=False)
    k = TINY.detections_per_img
    assert dets.boxes.shape == (2, k, 4)
    assert dets.scores.shape == (2, k)
    assert dets.masks.shape == (2, k, 28, 28)
    v = np.asarray(dets.valid)
    s = np.asarray(dets.scores)
    assert (s[~v] == 0).all()
    # valid boxes lie inside the image
    bx = np.asarray(dets.boxes)[v]
    if len(bx):
        assert (bx[:, 0] >= 0).all() and (bx[:, 2] <= 127).all()
    m = np.asarray(dets.masks)
    assert (m >= 0).all() and (m <= 1).all()


@pytest.mark.slow
def test_train_step_gradients(model_and_params):
    model, params = model_and_params
    images, sizes, gt = _batch()

    def loss_fn(p):
        losses = model.apply(
            p, images, sizes, gt, train=True,
            rngs={"sample": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
        )
        return sum(losses.values())

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # frozen stages get zero grads via stop_gradient
    g_stem = grads["params"]["backbone"]["body"]["stem"]["conv1"]["kernel"]
    assert float(jnp.abs(g_stem).sum()) == 0.0
    g_l3 = grads["params"]["backbone"]["body"]["layer3_0"]["conv1"]["kernel"]
    assert float(jnp.abs(g_l3).sum()) > 0.0


@pytest.mark.slow
def test_detections_from_features_matches_forward_test(model_and_params):
    """The features-in test forward (the MT teacher's pseudo-labeling
    entry, which reuses the batched 2K-view backbone pass) must
    bit-match the image-in forward_test."""
    model, params = model_and_params
    images, sizes, _ = _batch()
    ref = model.apply(params, images, sizes, train=False)
    feats = model.apply(params, images, method=model.extract_features)
    out = model.apply(
        params, feats, sizes, images, method=model.detections_from_features
    )
    for name in ("boxes", "scores", "labels", "valid", "masks"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(out, name)), err_msg=name
        )
