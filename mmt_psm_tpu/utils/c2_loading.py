"""Caffe2 Detectron checkpoint loading (.pkl) + model catalog + URL cache.

Parity with the reference resolution chain (reference:
maskrcnn_benchmark/utils/checkpoint.py:178-201 ``DetectronCheckpointer.
_load_file``, utils/c2_model_loading.py:12-155, utils/model_zoo.py,
config/paths_catalog.py:177-229 ModelCatalog):

* ``catalog://X`` names resolve to the Detectron S3 URLs;
* http(s) URLs are served from a local cache dir (this environment has
  no egress — a cache miss raises with the path to pre-seed);
* ``.pkl`` files are Caffe2 blob pickles whose keys are renamed to the
  reference's torch naming (res2_0_branch2a_w -> backbone.body.layer1.
  0.conv1.weight, ...) so the shared torch->flax converter applies.

The rename is implemented as one ordered regex pass over each key
instead of the reference's ~30 sequential str.replace calls; outputs
are identical for the R-50/R-101 (-C4/-FPN) key space (tested in
tests/test_c2_loading.py).
"""

from __future__ import annotations

import os
import pickle
import re

import numpy as np

_S3 = "https://s3-us-west-2.amazonaws.com/detectron"


class ModelCatalog:
    """catalog:// name -> Detectron URL (paths_catalog.py:177-229)."""

    C2_IMAGENET_MODELS = {
        "MSRA/R-50": "ImageNetPretrained/MSRA/R-50.pkl",
        "MSRA/R-101": "ImageNetPretrained/MSRA/R-101.pkl",
        "FAIR/20171220/X-101-32x8d": "ImageNetPretrained/20171220/X-101-32x8d.pkl",
    }
    C2_DETECTRON_SUFFIX = (
        "output/train/coco_2014_train%3Acoco_2014_valminusminival/generalized_rcnn/model_final.pkl"
    )
    C2_DETECTRON_MODELS = {
        "35857197/e2e_faster_rcnn_R-50-C4_1x": "01_33_49.iAX0mXvW",
        "35857345/e2e_faster_rcnn_R-50-FPN_1x": "01_36_30.cUF7QR7I",
        "35857890/e2e_faster_rcnn_R-101-FPN_1x": "01_38_50.sNxI7sX7",
        "36761737/e2e_faster_rcnn_X-101-32x8d-FPN_1x": "06_31_39.5MIHi1fZ",
        "35858791/e2e_mask_rcnn_R-50-C4_1x": "01_45_57.ZgkA7hPB",
        "35858933/e2e_mask_rcnn_R-50-FPN_1x": "01_48_14.DzEQe4wC",
        "35861795/e2e_mask_rcnn_R-101-FPN_1x": "02_31_37.KqyEK4tT",
        "36761843/e2e_mask_rcnn_X-101-32x8d-FPN_1x": "06_35_59.RZotkLKI",
    }

    @staticmethod
    def get(name: str) -> str:
        if name.startswith("ImageNetPretrained"):
            rel = ModelCatalog.C2_IMAGENET_MODELS[name[len("ImageNetPretrained/") :]]
            return f"{_S3}/{rel}"
        if name.startswith("Caffe2Detectron/COCO"):
            name = name[len("Caffe2Detectron/COCO/") :]
            model_id, model_name = name.split("/")
            signature = ModelCatalog.C2_DETECTRON_MODELS[name]
            return f"{_S3}/{model_id}/12_2017_baselines/{model_name}.yaml.{signature}/{ModelCatalog.C2_DETECTRON_SUFFIX}"
        raise RuntimeError(f"model not present in the catalog: {name}")


# last-block index per stage for the FPN key suffixes
# (c2_model_loading.py:_C2_STAGE_NAMES)
_STAGE_LAST_BLOCK = {"R-50": (2, 3, 5, 2), "R-101": (2, 3, 22, 2)}

# body-level blobs: stem + residual stages
_RE_STEM = re.compile(r"^conv1_(w|b)$|^res_conv1_bn_(s|b)$")
_RE_BLOCK = re.compile(r"^res(\d)_(\d+)_branch(1|2a|2b|2c)(_bn)?_(w|s|b)$")
_RE_FPN_INNER = re.compile(r"^fpn_inner_res(\d)_(\d+)_sum(_lateral)?_(w|b)$")
_RE_FPN_LAYER = re.compile(r"^fpn_res(\d)_(\d+)_sum_(w|b)$")
_RE_RPN = re.compile(r"^(conv_rpn|rpn_cls_logits|rpn_bbox_pred)(_fpn2)?_(w|b)$")
# head blobs: bare Detectron names -> reference full module paths
_HEAD_PREFIX = {
    "fc6": "roi_heads.box.feature_extractor.",
    "fc7": "roi_heads.box.feature_extractor.",
    "cls_score": "roi_heads.box.predictor.",
    "bbox_pred": "roi_heads.box.predictor.",
    "conv5_mask": "roi_heads.mask.predictor.",
    "mask_fcn_logits": "roi_heads.mask.predictor.",
}
_RE_HEAD = re.compile(r"^(fc6|fc7|cls_score|bbox_pred|conv5_mask|mask_fcn_logits|mask_fcn\d)_(w|b)$")

_BRANCH2 = {"2a": "conv1", "2b": "conv2", "2c": "conv3"}
_BRANCH2_BN = {"2a": "bn1", "2b": "bn2", "2c": "bn3"}
_LEAF = {"w": "weight", "b": "bias", "s": "weight"}  # bn scale -> weight


def rename_c2_key(key: str, arch: str = "R-50") -> str | None:
    """One Caffe2 blob name -> reference torch parameter name, or None
    for blobs the torch model has no slot for (momenta, fc1000)."""
    if key.endswith("_momentum") or key.startswith(("pred_", "fc1000")):
        return None
    m = _RE_STEM.match(key)
    if m:
        if key.startswith("conv1"):
            return f"backbone.body.stem.conv1.{_LEAF[key[-1]]}"
        return f"backbone.body.stem.bn1.{_LEAF[key[-1]]}"
    m = _RE_BLOCK.match(key)
    if m:
        stage, block, branch, is_bn, leaf = m.groups()
        layer = int(stage) - 1
        if branch == "1":
            mod = "downsample.1" if is_bn else "downsample.0"
        else:
            mod = _BRANCH2_BN[branch] if is_bn else _BRANCH2[branch]
        return f"backbone.body.layer{layer}.{block}.{mod}.{_LEAF[leaf]}"
    m = _RE_FPN_INNER.match(key)
    if m:
        stage, block, lateral, leaf = m.groups()
        idx = int(stage) - 1
        # only the top stage has no "_lateral" suffix; the index check
        # mirrors the reference's per-stage loop (c2_model_loading.py:53-62)
        last = _STAGE_LAST_BLOCK[arch][idx - 1]
        if int(block) != last or bool(lateral) != (idx < 4):
            return None
        return f"backbone.fpn.fpn_inner{idx}.{_LEAF[leaf]}"
    m = _RE_FPN_LAYER.match(key)
    if m:
        stage, block, leaf = m.groups()
        idx = int(stage) - 1
        if int(block) != _STAGE_LAST_BLOCK[arch][idx - 1]:
            return None
        return f"backbone.fpn.fpn_layer{idx}.{_LEAF[leaf]}"
    m = _RE_RPN.match(key)
    if m:
        name, _, leaf = m.groups()
        mod = {"conv_rpn": "conv", "rpn_cls_logits": "cls_logits", "rpn_bbox_pred": "bbox_pred"}[name]
        return f"rpn.head.{mod}.{_LEAF[leaf]}"
    m = _RE_HEAD.match(key)
    if m:
        name, leaf = m.groups()
        prefix = _HEAD_PREFIX.get(name, "roi_heads.mask.feature_extractor.")
        return f"{prefix}{name}.{_LEAF[leaf]}"
    return None


def load_c2_pickle(path: str, arch: str = "R-50") -> dict:
    """.pkl Caffe2 blobs -> {reference torch name: np.ndarray}
    (c2_model_loading.py:120-155)."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    blobs = data.get("blobs", data) if isinstance(data, dict) else data
    out = {}
    for k in sorted(blobs.keys()):
        new = rename_c2_key(k, arch)
        if new is not None:
            out[new] = np.asarray(blobs[k])
    return out


def cache_url(url: str, cache_dir: str | None = None) -> str:
    """Resolve a URL to a local cached file (utils/model_zoo.py). This
    environment has no network egress: a cache hit is returned, a miss
    raises with the expected path so the file can be pre-seeded."""
    cache_dir = cache_dir or os.environ.get(
        "TORCH_MODEL_ZOO", os.path.expanduser("~/.torch/models")
    )
    fname = os.path.basename(url.split("?")[0].rstrip("/"))
    # Detectron URLs all end in model_final.pkl; disambiguate by id
    if fname == "model_final.pkl":
        m = re.search(r"detectron/(\d+)/", url)
        if m:
            fname = f"{m.group(1)}_{fname}"
    cached = os.path.join(cache_dir, fname)
    if os.path.exists(cached):
        return cached
    raise FileNotFoundError(
        f"{url} is not cached and this environment has no network access; "
        f"place the file at {cached}"
    )


def resolve_checkpoint(f: str, cache_dir: str | None = None) -> str:
    """catalog:// and http resolution (checkpoint.py:180-193)."""
    if f.startswith("catalog://"):
        f = ModelCatalog.get(f[len("catalog://") :])
    if f.startswith("http"):
        f = cache_url(f, cache_dir)
    return f


def load_checkpoint_file(path: str, params: dict, transfer: bool = True, arch: str = "R-50"):
    """Resolve + load any supported checkpoint format into flax params:
    catalog:// / http / Caffe2 .pkl / torch .pth (checkpoint.py:178-201)."""
    from .torch_import import apply_to_params, convert_state_dict, load_torch_checkpoint

    path = resolve_checkpoint(path)
    if path.endswith(".pkl"):
        sd = load_c2_pickle(path, arch)
        flat = convert_state_dict(sd, transfer=transfer)
        return apply_to_params(params, flat)
    return load_torch_checkpoint(path, params, transfer=transfer)
