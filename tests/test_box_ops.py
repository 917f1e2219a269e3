import numpy as np
import jax.numpy as jnp

from mmt_psm_tpu.structures import boxes as B
from mmt_psm_tpu.ops import box_coder

from oracles import box_decode_oracle, box_encode_oracle, iou_oracle, random_boxes


def test_iou_matches_oracle():
    rng = np.random.default_rng(0)
    a = random_boxes(rng, 37)
    b = random_boxes(rng, 21)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    want = iou_oracle(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_area_legacy_convention():
    b = jnp.asarray([[0.0, 0.0, 9.0, 19.0]])
    assert float(B.box_area(b)[0]) == 10 * 20


def test_clip_to_image():
    b = jnp.asarray([[-5.0, -3.0, 250.0, 90.0]])
    got = np.asarray(B.clip_to_image(b, height=100, width=200))
    np.testing.assert_allclose(got, [[0, 0, 199, 90]])


def test_hflip_involution():
    rng = np.random.default_rng(1)
    b = jnp.asarray(random_boxes(rng, 11, size=128))
    flipped2 = B.hflip_boxes(B.hflip_boxes(b, 128), 128)
    np.testing.assert_allclose(np.asarray(flipped2), np.asarray(b), atol=1e-5)


def test_vflip_involution():
    rng = np.random.default_rng(2)
    b = jnp.asarray(random_boxes(rng, 11, size=128))
    flipped2 = B.vflip_boxes(B.vflip_boxes(b, 128), 128)
    np.testing.assert_allclose(np.asarray(flipped2), np.asarray(b), atol=1e-5)


def test_xywh_roundtrip():
    rng = np.random.default_rng(3)
    b = jnp.asarray(random_boxes(rng, 9))
    rt = B.xywh_to_xyxy(B.xyxy_to_xywh(b))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(b), atol=1e-5)


def test_encode_matches_oracle():
    rng = np.random.default_rng(4)
    gt = random_boxes(rng, 25)
    prop = random_boxes(rng, 25)
    w = (10.0, 10.0, 5.0, 5.0)
    got = np.asarray(box_coder.encode(jnp.asarray(gt), jnp.asarray(prop), w))
    want = box_encode_oracle(gt.astype(np.float64), prop.astype(np.float64), w)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_decode_matches_oracle_multiclass():
    rng = np.random.default_rng(5)
    base = random_boxes(rng, 17)
    codes = rng.normal(0, 0.5, (17, 12)).astype(np.float32)  # 3 classes
    w = (10.0, 10.0, 5.0, 5.0)
    got = np.asarray(box_coder.decode(jnp.asarray(codes), jnp.asarray(base), w))
    want = box_decode_oracle(codes.astype(np.float64), base.astype(np.float64), w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(6)
    gt = jnp.asarray(random_boxes(rng, 13))
    prop = jnp.asarray(random_boxes(rng, 13))
    w = (10.0, 10.0, 5.0, 5.0)
    codes = box_coder.encode(gt, prop, w)
    rec = box_coder.decode(codes, prop, w)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), rtol=1e-3, atol=1e-2)
