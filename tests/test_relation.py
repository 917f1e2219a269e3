import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.models.relation import (
    RelationNMS,
    RelationNMSConfig,
    position_matrix_embedding,
    prepare_nms_labels,
    rank_embedding,
    relation_nms_inference,
    relation_nms_loss,
)
from mmt_psm_tpu.models import MaskRCNN, ModelConfig
from mmt_psm_tpu.structures.detections import GroundTruth

from test_detector import _batch


def test_rank_embedding_shape_and_values():
    e = np.asarray(rank_embedding(10, 8))
    assert e.shape == (10, 8)
    # rank 0: sin=0, cos=1
    np.testing.assert_allclose(e[0, :4], 0.0, atol=1e-6)
    np.testing.assert_allclose(e[0, 4:], 1.0, atol=1e-6)


def test_position_matrix_embedding_shape():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 100, (7, 2, 2)).astype(np.float32)
    wh = rng.uniform(5, 50, (7, 2, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], axis=-1))
    emb = position_matrix_embedding(boxes, 64)
    assert emb.shape == (2, 7, 7, 64)
    assert np.isfinite(np.asarray(emb)).all()


def test_prepare_labels_best_score_per_gt():
    # one gt of class 1; three boxes overlapping it with varying scores
    gt_boxes = jnp.asarray([[0.0, 0.0, 20.0, 20.0]])
    gt_labels = jnp.asarray([1], jnp.int32)
    gt_valid = jnp.asarray([True])
    sorted_boxes = jnp.asarray(
        [
            [[0.0, 0.0, 20.0, 20.0]],
            [[1.0, 1.0, 21.0, 21.0]],
            [[50.0, 50.0, 60.0, 60.0]],
        ]
    )  # [N=3, C=1, 4]
    sorted_scores = jnp.asarray([[0.5], [0.9], [0.8]])  # box 1 scores higher
    labels = np.asarray(
        prepare_nms_labels(sorted_boxes, sorted_scores, gt_boxes, gt_labels, gt_valid, (0.5,), reg_iou=False)
    )
    # the best-scoring overlapping box (idx 1) is the true positive
    np.testing.assert_array_equal(labels[:, 0, 0], [0, 1, 0])

    reg = np.asarray(
        prepare_nms_labels(sorted_boxes, sorted_scores, gt_boxes, gt_labels, gt_valid, (0.5,), reg_iou=True)
    )
    assert reg[1, 0, 0] > 0.8  # its IoU with gt
    assert reg[0, 0, 0] == 0 and reg[2, 0, 0] == 0


def test_prepare_labels_no_gt_of_class():
    gt_boxes = jnp.asarray([[0.0, 0.0, 20.0, 20.0]])
    gt_labels = jnp.asarray([2], jnp.int32)  # only class 2
    gt_valid = jnp.asarray([True])
    sorted_boxes = jnp.ones((3, 2, 4))
    sorted_scores = jnp.ones((3, 2)) * 0.5
    labels = np.asarray(
        prepare_nms_labels(sorted_boxes, sorted_scores, gt_boxes, gt_labels, gt_valid, (0.5,), reg_iou=False)
    )
    np.testing.assert_allclose(labels[:, 0, :], 0.0)  # class 1 has no gt


@pytest.mark.slow
def test_relation_nms_module_roundtrip():
    cfg = RelationNMSConfig(first_n=16, topk=8, detections_per_img=16)
    mod = RelationNMS(config=cfg)
    rng = np.random.default_rng(1)
    s = 32
    appearance = jnp.asarray(rng.normal(0, 1, (s, 1024)).astype(np.float32))
    probs = jax.nn.softmax(jnp.asarray(rng.normal(0, 1, (s, 3)).astype(np.float32)))
    regs = jnp.asarray(rng.normal(0, 0.1, (s, 12)).astype(np.float32))
    boxes = jnp.asarray(np.stack([
        rng.uniform(0, 50, s), rng.uniform(0, 50, s),
        rng.uniform(60, 120, s), rng.uniform(60, 120, s)], axis=1).astype(np.float32))
    valid = jnp.ones((s,), bool)
    hw = jnp.asarray([128, 128])

    params = mod.init(jax.random.PRNGKey(0), appearance, probs, regs, boxes, valid, hw)
    out = mod.apply(params, appearance, probs, regs, boxes, valid, hw)
    assert out["logits"].shape == (16, 2, 1)
    assert out["sorted_boxes"].shape == (16, 2, 4)

    gt_boxes = jnp.asarray([[10.0, 10.0, 60.0, 60.0], [30.0, 20.0, 90.0, 80.0]])
    gt_labels = jnp.asarray([1, 2], jnp.int32)
    gt_valid = jnp.asarray([True, True])
    loss = float(relation_nms_loss(out, gt_boxes, gt_labels, gt_valid, cfg))
    assert np.isfinite(loss) and loss >= 0

    b, sc, lab, v = relation_nms_inference(out, cfg)
    assert b.shape[0] == sc.shape[0] == lab.shape[0] == v.shape[0]
    v = np.asarray(v)
    lab = np.asarray(lab)
    assert set(np.unique(lab[v])) <= {1, 2}


@pytest.mark.slow
def test_detector_with_relation_nms():
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
    )
    model = MaskRCNN(config=cfg)
    images, sizes, gt = _batch()
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, images, sizes, gt, train=True)
    losses = model.apply(params, images, sizes, gt, train=True, rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)})
    assert "nms_loss" in losses
    assert np.isfinite(float(losses["nms_loss"]))

    dets = model.apply(params, images, sizes, train=False)
    assert dets.boxes.shape[0] == 2
    assert dets.masks is not None
    lab = np.asarray(dets.labels)[np.asarray(dets.valid)]
    assert set(np.unique(lab)) <= {1, 2}
