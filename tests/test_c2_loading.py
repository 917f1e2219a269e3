"""Caffe2 .pkl / catalog:// / URL checkpoint resolution (VERDICT r1
items 9-10).

The C2->torch key rename is checked golden against the reference's own
_rename_weights_for_resnet (reference: maskrcnn_benchmark/utils/
c2_model_loading.py:74-118) under the reference's suffix-matching
contract (model_serialization.py:10-60): our full module path must end
with the reference's renamed key.
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest

from mmt_psm_tpu.utils.c2_loading import (
    ModelCatalog,
    cache_url,
    load_c2_pickle,
    load_checkpoint_file,
    rename_c2_key,
    resolve_checkpoint,
)

REFERENCE = "/root/reference"

R50_BLOCKS = {2: 3, 3: 4, 4: 6, 5: 3}


def _c2_r50_fpn_keys():
    keys = ["conv1_w", "res_conv1_bn_s", "res_conv1_bn_b"]
    for s, n in R50_BLOCKS.items():
        for b in range(n):
            for br in ("2a", "2b", "2c"):
                keys += [f"res{s}_{b}_branch{br}_w", f"res{s}_{b}_branch{br}_bn_s", f"res{s}_{b}_branch{br}_bn_b"]
            if b == 0:
                keys += [f"res{s}_{b}_branch1_w", f"res{s}_{b}_branch1_bn_s", f"res{s}_{b}_branch1_bn_b"]
    for s in (2, 3, 4):
        last = R50_BLOCKS[s] - 1
        keys += [f"fpn_inner_res{s}_{last}_sum_lateral_w", f"fpn_inner_res{s}_{last}_sum_lateral_b"]
    keys += ["fpn_inner_res5_2_sum_w", "fpn_inner_res5_2_sum_b"]
    for s, n in R50_BLOCKS.items():
        keys += [f"fpn_res{s}_{n-1}_sum_w", f"fpn_res{s}_{n-1}_sum_b"]
    keys += [
        "conv_rpn_fpn2_w", "conv_rpn_fpn2_b",
        "rpn_cls_logits_fpn2_w", "rpn_cls_logits_fpn2_b",
        "rpn_bbox_pred_fpn2_w", "rpn_bbox_pred_fpn2_b",
        "fc6_w", "fc6_b", "fc7_w", "fc7_b",
        "cls_score_w", "cls_score_b", "bbox_pred_w", "bbox_pred_b",
        "mask_fcn1_w", "mask_fcn1_b", "mask_fcn2_w", "mask_fcn2_b",
        "mask_fcn3_w", "mask_fcn3_b", "mask_fcn4_w", "mask_fcn4_b",
        "conv5_mask_w", "conv5_mask_b", "mask_fcn_logits_w", "mask_fcn_logits_b",
        "conv1_momentum", "res2_0_branch2a_w_momentum",
    ]
    return keys


@pytest.fixture(scope="module")
def ref_rename():
    torch = pytest.importorskip("torch")
    sys.dont_write_bytecode = True
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.int_classes, six.string_classes, six.PY3 = int, str, True
        sys.modules["torch._six"] = six
        torch._six = six
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_c2", os.path.join(REFERENCE, "maskrcnn_benchmark/utils/c2_model_loading.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rename_golden_vs_reference(ref_rename):
    keys = _c2_r50_fpn_keys()
    weights = {k: np.zeros(1, np.float32) for k in keys}
    ref_out = ref_rename._rename_weights_for_resnet(dict(weights), ["1.2", "2.3", "3.5", "4.2"])
    ours = {k: rename_c2_key(k, "R-50") for k in keys}
    for c2_key, ref_name in zip(sorted(weights.keys()), ref_out.keys()):
        pass  # ref_out keys are in sorted(original) order minus momenta
    ref_names = list(ref_out.keys())
    our_names = [ours[k] for k in sorted(weights) if not k.endswith("_momentum")]
    assert len(ref_names) == len(our_names)
    for ref_name, our_name in zip(ref_names, our_names):
        assert our_name is not None
        if ref_name.startswith("mask.fcn"):
            # deliberate divergence: the reference's rename
            # k.replace(".[mask].fcn", "mask_fcn") is a literal string
            # that never matches (c2_model_loading.py:89), so C2
            # mask_fcn* weights silently fail to suffix-match and are
            # DROPPED by the reference loader. We map them correctly.
            assert our_name.endswith(ref_name.replace("mask.fcn", "mask_fcn")), (ref_name, our_name)
            continue
        assert our_name.endswith(ref_name), (ref_name, our_name)
    # momenta dropped on both sides
    assert ours["conv1_momentum"] is None
    assert ours["res2_0_branch2a_w_momentum"] is None


def test_model_catalog_urls():
    url = ModelCatalog.get("ImageNetPretrained/MSRA/R-50")
    assert url.endswith("ImageNetPretrained/MSRA/R-50.pkl") and url.startswith("https://")
    url = ModelCatalog.get("Caffe2Detectron/COCO/35858933/e2e_mask_rcnn_R-50-FPN_1x")
    assert "35858933" in url and "01_48_14.DzEQe4wC" in url and url.endswith("model_final.pkl")
    with pytest.raises(RuntimeError):
        ModelCatalog.get("nope/nope")


def test_cache_url_hit_and_miss(tmp_path):
    cached = tmp_path / "R-50.pkl"
    cached.write_bytes(b"x")
    url = "https://s3-us-west-2.amazonaws.com/detectron/ImageNetPretrained/MSRA/R-50.pkl"
    assert cache_url(url, str(tmp_path)) == str(cached)
    with pytest.raises(FileNotFoundError):
        cache_url("https://example.com/other.pkl", str(tmp_path))
    # catalog:// resolves through to the cached file
    os.environ["TORCH_MODEL_ZOO"] = str(tmp_path)
    try:
        assert resolve_checkpoint("catalog://ImageNetPretrained/MSRA/R-50") == str(cached)
    finally:
        del os.environ["TORCH_MODEL_ZOO"]


def test_load_c2_pickle_into_params(tmp_path):
    # a minimal C2 blob set covering conv/bn/fpn/rpn keys with real shapes
    blobs = {
        "conv1_w": np.random.default_rng(0).normal(size=(64, 3, 7, 7)).astype(np.float32),
        "res_conv1_bn_s": np.ones(64, np.float32),
        "res_conv1_bn_b": np.zeros(64, np.float32),
        "conv1_momentum": np.zeros(1, np.float32),
    }
    p = tmp_path / "R-50.pkl"
    with open(p, "wb") as f:
        pickle.dump({"blobs": blobs}, f, protocol=2)
    sd = load_c2_pickle(str(p))
    assert set(sd) == {
        "backbone.body.stem.conv1.weight",
        "backbone.body.stem.bn1.weight",
        "backbone.body.stem.bn1.bias",
    }
    assert sd["backbone.body.stem.conv1.weight"].shape == (64, 3, 7, 7)

    # end-to-end: the stem conv lands in a matching flax tree, transposed
    params = {
        "backbone": {
            "body": {
                "stem": {
                    "conv1": {"kernel": np.zeros((7, 7, 3, 64), np.float32)},
                    "bn1": {"weight": np.zeros(64, np.float32), "bias": np.zeros(64, np.float32)},
                }
            }
        }
    }
    new, report = load_checkpoint_file(str(p), params, transfer=True)
    assert len(report["loaded"]) == 3 and not report["mismatched"]
    np.testing.assert_allclose(
        new["backbone"]["body"]["stem"]["conv1"]["kernel"],
        blobs["conv1_w"].transpose(2, 3, 1, 0),
    )
