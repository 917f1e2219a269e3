"""Weight-conversion parity: torch ops vs flax modules on the same weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from mmt_psm_tpu.models.layers import FrozenBatchNorm, conv
from mmt_psm_tpu.models.resnet import Bottleneck
from mmt_psm_tpu.utils.torch_import import apply_to_params, convert_state_dict
from mmt_psm_tpu.utils.checkpoint import Checkpointer


def _torch_frozen_bn(x, w, b, rm, rv):
    scale = w * rv.rsqrt()
    bias = b - rm * scale
    return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)


def test_conv_bn_layout_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 3, 16, 16)).astype(np.float32)  # NCHW for torch
    w = rng.normal(0, 0.1, (8, 3, 3, 3)).astype(np.float32)
    bn_w = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    bn_b = rng.normal(0, 1, 8).astype(np.float32)
    bn_rm = rng.normal(0, 1, 8).astype(np.float32)
    bn_rv = rng.uniform(0.5, 2.0, 8).astype(np.float32)

    tx = torch.from_numpy(x)
    ty = F.conv2d(tx, torch.from_numpy(w), stride=1, padding=1)
    ty = _torch_frozen_bn(ty, *map(torch.from_numpy, (bn_w, bn_b, bn_rm, bn_rv)))
    want = ty.numpy().transpose(0, 2, 3, 1)  # to NHWC

    import flax.linen as nn

    class MiniM(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = conv(8, 3, stride=1, padding=1, name="conv1")(x)
            return FrozenBatchNorm(8, name="bn1")(x)

    m = MiniM()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = m.init(jax.random.PRNGKey(0), xj)["params"]
    params["conv1"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    params["bn1"]["weight"] = jnp.asarray(bn_w)
    params["bn1"]["bias"] = jnp.asarray(bn_b)
    params["bn1"]["running_mean"] = jnp.asarray(bn_rm)
    params["bn1"]["running_var"] = jnp.asarray(bn_rv)
    got = np.asarray(m.apply({"params": params}, xj))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_state_dict_conversion_into_bottleneck():
    """Convert torch-named weights for one bottleneck block and run both."""
    rng = np.random.default_rng(1)
    cin, cmid, cout = 8, 4, 16

    def t(shape, scale=0.1):
        return rng.normal(0, scale, shape).astype(np.float32)

    sd = {}
    sd["backbone.body.layer1.0.conv1.weight"] = t((cmid, cin, 1, 1))
    sd["backbone.body.layer1.0.conv2.weight"] = t((cmid, cmid, 3, 3))
    sd["backbone.body.layer1.0.conv3.weight"] = t((cout, cmid, 1, 1))
    sd["backbone.body.layer1.0.downsample.0.weight"] = t((cout, cin, 1, 1))
    for bn, ch in [("bn1", cmid), ("bn2", cmid), ("bn3", cout), ("downsample.1", cout)]:
        sd[f"backbone.body.layer1.0.{bn}.weight"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)
        sd[f"backbone.body.layer1.0.{bn}.bias"] = t(ch, 1.0)
        sd[f"backbone.body.layer1.0.{bn}.running_mean"] = t(ch, 1.0)
        sd[f"backbone.body.layer1.0.{bn}.running_var"] = rng.uniform(0.5, 2.0, ch).astype(np.float32)

    flat = convert_state_dict(sd)
    assert "__unmatched__" not in flat

    # torch forward
    x = rng.normal(0, 1, (1, cin, 10, 10)).astype(np.float32)
    tx = torch.from_numpy(x)

    def fbn(y, p):
        return _torch_frozen_bn(
            y,
            torch.from_numpy(sd[f"backbone.body.layer1.0.{p}.weight"]),
            torch.from_numpy(sd[f"backbone.body.layer1.0.{p}.bias"]),
            torch.from_numpy(sd[f"backbone.body.layer1.0.{p}.running_mean"]),
            torch.from_numpy(sd[f"backbone.body.layer1.0.{p}.running_var"]),
        )

    res = fbn(F.conv2d(tx, torch.from_numpy(sd["backbone.body.layer1.0.downsample.0.weight"])), "downsample.1")
    y = F.relu(fbn(F.conv2d(tx, torch.from_numpy(sd["backbone.body.layer1.0.conv1.weight"])), "bn1"))
    y = F.relu(fbn(F.conv2d(y, torch.from_numpy(sd["backbone.body.layer1.0.conv2.weight"]), padding=1), "bn2"))
    y = fbn(F.conv2d(y, torch.from_numpy(sd["backbone.body.layer1.0.conv3.weight"])), "bn3")
    want = F.relu(y + res).numpy().transpose(0, 2, 3, 1)

    # flax forward with converted weights
    import flax.linen as nn

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Bottleneck(bottleneck_channels=cmid, out_channels=cout, name="layer1_0")(x)

    m = Wrap()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = {"params": m.init(jax.random.PRNGKey(0), xj)["params"]}
    stripped = {k.replace("backbone/body/", ""): v for k, v in flat.items()}
    new_params, report = apply_to_params(params["params"], stripped, strict=True)
    got = np.asarray(m.apply({"params": new_params}, xj))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert len(report["loaded"]) == len(stripped)


def test_linear_chw_conversion():
    rng = np.random.default_rng(2)
    c, h, w_ = 4, 3, 3
    weight = rng.normal(0, 0.1, (16, c * h * w_)).astype(np.float32)
    bias = rng.normal(0, 0.1, 16).astype(np.float32)
    x_chw = rng.normal(0, 1, (2, c, h, w_)).astype(np.float32)
    want = (torch.from_numpy(x_chw.reshape(2, -1)) @ torch.from_numpy(weight).T + torch.from_numpy(bias)).numpy()

    flat = convert_state_dict(
        {"box_heads.box.feature_extractor.fc6.weight": weight, "box_heads.box.feature_extractor.fc6.bias": bias},
        pooled_shape=(c, h, w_),
    )
    k = flat["box_extractor/fc6.kernel"]
    b = flat["box_extractor/fc6.bias"]
    x_hwc_flat = x_chw.transpose(0, 2, 3, 1).reshape(2, -1)
    got = x_hwc_flat @ k + b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_transfer_mode_strips_heads():
    sd = {
        "box_heads.box.predictor.cls_score.weight": np.zeros((3, 1024), np.float32),
        "box_heads.box.predictor.bbox_pred.weight": np.zeros((12, 1024), np.float32),
        "mask_heads.mask.predictor.mask_fcn_logits.weight": np.zeros((3, 256, 1, 1), np.float32),
        "rpn.head.conv.weight": np.zeros((256, 256, 3, 3), np.float32),
    }
    flat = convert_state_dict(sd, transfer=True)
    assert "rpn/conv.kernel" in flat
    assert not any("cls_score" in k or "bbox_pred" in k or "mask_fcn_logits" in k for k in flat)


def test_checkpointer_roundtrip(tmp_path):
    ck = Checkpointer(str(tmp_path))
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": {"c": np.float32(3.5)}}
    ck.save("model_0000005", tree)
    assert ck.last_name() == "model_0000005"
    restored = ck.load(target=tree)
    np.testing.assert_allclose(restored["a"], tree["a"])
    np.testing.assert_allclose(restored["b"]["c"], 3.5)
