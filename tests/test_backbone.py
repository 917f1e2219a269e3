import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.models.anchors import fpn_anchors, generate_cell_anchors, visibility
from mmt_psm_tpu.models.backbone import ResNetFPNBackbone
from mmt_psm_tpu.ops.pooler import assign_levels, multilevel_roi_align


def test_cell_anchors_match_reference_code():
    # Golden values produced by executing the reference's own
    # generate_anchors (anchor_generator.py:196-265). (The -83 matlab
    # array in its comments predates the [1,1,s]-1 base shift; the code
    # itself yields these.)
    got = generate_cell_anchors(16, (128, 256, 512), (0.5, 1, 2))
    want = np.array(
        [
            [-84, -40, 99, 55],
            [-176, -88, 191, 103],
            [-360, -184, 375, 199],
            [-56, -56, 71, 71],
            [-120, -120, 135, 135],
            [-248, -248, 263, 263],
            [-36, -80, 51, 95],
            [-80, -168, 95, 183],
            [-168, -344, 183, 359],
        ],
        np.float32,
    )
    np.testing.assert_allclose(got, want)
    # FPN-style single-size cell (stride 4, size 32), same source.
    got4 = generate_cell_anchors(4, (32,), (0.5, 1.0, 2.0))
    want4 = np.array([[-22, -10, 25, 13], [-14, -14, 17, 17], [-10, -22, 13, 25]], np.float32)
    np.testing.assert_allclose(got4, want4)


def test_fpn_anchor_counts_and_visibility():
    levels = fpn_anchors(256)
    assert len(levels) == 5
    assert levels[0].shape == ((256 // 4) ** 2 * 3, 4)
    assert levels[4].shape == ((256 // 64) ** 2 * 3, 4)
    vis = visibility(jnp.asarray(levels[0]), 200, 200, 0)
    vis_full = visibility(jnp.asarray(levels[0]), 256, 256, 0)
    assert int(vis.sum()) < int(vis_full.sum())


@pytest.mark.slow
def test_backbone_shapes():
    model = ResNetFPNBackbone()
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert len(feats) == 5
    sizes = [(32, 32), (16, 16), (8, 8), (4, 4), (2, 2)]
    for f, (h, w) in zip(feats, sizes):
        assert f.shape == (1, h, w, 256), f.shape


def test_level_assignment():
    boxes = jnp.asarray(
        [
            [0, 0, 31, 31],  # sqrt(area)=32 -> lvl 4+log2(32/224) = 1.2 -> clamp 2
            [0, 0, 223, 223],  # 224 -> lvl 4
            [0, 0, 500, 500],  # ~501 -> lvl 5
            [0, 0, 111, 111],  # 112 -> lvl 3
        ],
        jnp.float32,
    )
    lvls = np.asarray(assign_levels(boxes, 2, 5))
    np.testing.assert_array_equal(lvls, [0, 2, 3, 1])


def test_multilevel_pooler_selects_right_level():
    # Constant-valued feature maps: pooled output identifies the level.
    feats = [jnp.full((64 // 2**i, 64 // 2**i, 2), float(i)) for i in range(4)]
    scales = (0.25, 0.125, 0.0625, 0.03125)
    # image is 256x256 (P2 map is 64x64 at scale 0.25); keep boxes inside
    boxes = jnp.asarray(
        [[0, 0, 40, 40], [0, 0, 200, 200], [0, 0, 255, 255]], jnp.float32
    )
    out = np.asarray(multilevel_roi_align(feats, boxes, scales, 7, 2))
    assert out.shape == (3, 7, 7, 2)
    np.testing.assert_allclose(out[0], 0.0, atol=1e-5)  # sqrt(a)=41  -> P2
    np.testing.assert_allclose(out[1], 1.0, atol=1e-5)  # sqrt(a)=201 -> P3
    np.testing.assert_allclose(out[2], 2.0, atol=1e-5)  # sqrt(a)=256 -> P4
