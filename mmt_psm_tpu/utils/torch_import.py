"""torch -> flax weight conversion.

The reference *requires* initializing from the COCO-pretrained
``e2e_mask_rcnn_R_50_FPN_1x.pth`` torch checkpoint
(reference: tools/train_mean_teacher.py:41-43), stripping the
class-count-dependent heads (utils/checkpoint.py:148-160). This module
maps that checkpoint's (maskrcnn-benchmark) parameter names and layouts
onto the mmt_psm_tpu flax tree:

* Conv2d OIHW -> HWIO;
* ConvTranspose2d (in,out,kh,kw) -> (kh,kw,in,out);
* Linear (out,in) -> (in,out);
* fc6 additionally permutes its input dim from CHW to HWC flattening;
* FrozenBatchNorm buffers copy through unchanged.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

# torch name prefix -> (flax path prefix, kind)
# kinds: conv, deconv, linear, linear_chw (fc6), bn, raw
_RULES = [
    (r"^backbone\.body\.stem\.conv1", ("backbone/body/stem/conv1", "conv")),
    (r"^backbone\.body\.stem\.bn1", ("backbone/body/stem/bn1", "bn")),
    (r"^backbone\.body\.layer(\d)\.(\d+)\.conv(\d)", (r"backbone/body/layer\1_\2/conv\3", "conv")),
    (r"^backbone\.body\.layer(\d)\.(\d+)\.bn(\d)", (r"backbone/body/layer\1_\2/bn\3", "bn")),
    (r"^backbone\.body\.layer(\d)\.(\d+)\.downsample\.0", (r"backbone/body/layer\1_\2/downsample_conv", "conv")),
    (r"^backbone\.body\.layer(\d)\.(\d+)\.downsample\.1", (r"backbone/body/layer\1_\2/downsample_bn", "bn")),
    (r"^backbone\.fpn\.fpn_inner(\d)", (r"backbone/fpn/fpn_inner\1", "conv")),
    (r"^backbone\.fpn\.fpn_layer(\d)", (r"backbone/fpn/fpn_layer\1", "conv")),
    (r"^rpn\.head\.conv", ("rpn/conv", "conv")),
    (r"^rpn\.head\.cls_logits", ("rpn/cls_logits", "conv")),
    (r"^rpn\.head\.bbox_pred", ("rpn/bbox_pred", "conv")),
    (r"^(?:roi_heads\.box|box_heads\.box)\.feature_extractor\.fc6", ("box_extractor/fc6", "linear_chw")),
    (r"^(?:roi_heads\.box|box_heads\.box)\.feature_extractor\.fc7", ("box_extractor/fc7", "linear")),
    (r"^(?:roi_heads\.box|box_heads\.box)\.predictor\.cls_score", ("box_predictor/cls_score", "linear")),
    (r"^(?:roi_heads\.box|box_heads\.box)\.predictor\.bbox_pred", ("box_predictor/bbox_pred", "linear")),
    (r"^(?:roi_heads\.mask|mask_heads\.mask)\.feature_extractor\.mask_fcn(\d)", (r"mask_extractor/mask_fcn\1", "conv")),
    (r"^(?:roi_heads\.mask|mask_heads\.mask)\.predictor\.conv5_mask", ("mask_predictor/conv5_mask", "deconv")),
    (r"^(?:roi_heads\.mask|mask_heads\.mask)\.predictor\.mask_fcn_logits", ("mask_predictor/mask_fcn_logits", "conv")),
    (r"^hint_adaptor\.adapter_(\d)", (r"hint_adaptor/adapter_\1", "conv")),
    (r"^relation_nms\.nms_rank_fc", ("relation_nms/nms_rank_fc", "linear")),
    (r"^relation_nms\.roi_feat_embedding_fc", ("relation_nms/roi_feat_embedding_fc", "linear")),
    (r"^relation_nms\.classifier", ("relation_nms/classifier", "linear")),
    (r"^relation_nms\.relation_module\.WG", ("relation_nms/relation_module/WG", "linear")),
    (r"^relation_nms\.relation_module\.WK", ("relation_nms/relation_module/WK", "linear")),
    (r"^relation_nms\.relation_module\.WQ", ("relation_nms/relation_module/WQ", "linear")),
    (r"^relation_nms\.relation_module\.conv1", ("relation_nms/relation_module/conv1", "conv")),
    # mask relation refine net (reference mask_relation_module.py:16-107;
    # extractor relation_mask_feature_extractor.py:10-138)
    (
        r"^(?:roi_heads\.mask|mask_heads\.mask)\.mask_relation_module\."
        r"appearance_feature_extractor\.mask_fcn(\d)",
        (r"mask_relation/mask_fcn\1", "conv"),
    ),
    (
        r"^(?:roi_heads\.mask|mask_heads\.mask)\.mask_relation_module\."
        r"appearance_feature_extractor\.conv5_mask",
        ("mask_relation/extractor_conv5", "conv"),
    ),
    (
        r"^(?:roi_heads\.mask|mask_heads\.mask)\.mask_relation_module\.classifier",
        ("mask_relation/classifier", "conv"),
    ),
    (
        r"^(?:roi_heads\.mask|mask_heads\.mask)\.mask_relation_module\.deconv_1",
        ("mask_relation/deconv_1", "deconv"),
    ),
    (
        r"^(?:roi_heads\.mask|mask_heads\.mask)\.mask_relation_module\."
        r"relation_module(?=\.gamma)",
        ("mask_relation", "raw"),
    ),
]

# heads whose shapes depend on NUM_CLASSES; dropped in transfer mode
# (utils/checkpoint.py:148-160)
TRANSFER_SKIP = ("cls_score", "bbox_pred.", "mask_fcn_logits")


def _convert_tensor(kind: str, leaf: str, value: np.ndarray, pooled_hwc=None) -> tuple:
    """Returns (flax_leaf_name, converted array)."""
    v = np.asarray(value)
    if kind in ("bn", "raw"):
        return leaf, v  # buffers / scalar params pass through unchanged
    if leaf == "bias":
        return "bias", v
    if kind == "conv":
        return "kernel", v.transpose(2, 3, 1, 0)
    if kind == "deconv":
        # torch ConvTranspose2d computes the gradient-of-conv (no spatial
        # kernel flip); flax nn.ConvTranspose is a fractionally-strided
        # conv (flipped) — so flip the taps in addition to (in,out,kh,kw)
        # -> (kh,kw,in,out). Verified numerically in test_torch_parity.py.
        return "kernel", v.transpose(2, 3, 0, 1)[::-1, ::-1]
    if kind == "linear":
        return "kernel", v.transpose(1, 0)
    if kind == "linear_chw":
        # torch flattens pooled features as (C, H, W); ours as (H, W, C)
        out_dim, in_dim = v.shape
        c, h, w = pooled_hwc
        assert c * h * w == in_dim, (v.shape, pooled_hwc)
        v = v.reshape(out_dim, c, h, w).transpose(0, 2, 3, 1).reshape(out_dim, in_dim)
        return "kernel", v.transpose(1, 0)
    raise ValueError(kind)


def convert_state_dict(
    state_dict: Dict[str, np.ndarray],
    transfer: bool = False,
    pooled_shape=(256, 7, 7),
) -> Dict[str, np.ndarray]:
    """Convert a torch state dict into {'a/b/c.kernel': array} flat map.

    transfer=True drops class-count-dependent heads.
    """
    out = {}
    unmatched = []
    for name, value in state_dict.items():
        # strip only a LEADING DataParallel wrapper prefix — a global
        # replace would also eat interior names like
        # "relation_nms.relation_module.WG" (checkpoint.py:148-160 strips
        # the same way via model_serialization's prefix matching)
        name = re.sub(r"^module\.", "", name)
        if transfer and any(s in name for s in TRANSFER_SKIP):
            continue
        matched = False
        for pat, (repl, kind) in _RULES:
            m = re.match(pat, name)
            if not m:
                continue
            rest = name[m.end() :].lstrip(".")
            prefix = m.expand(repl) if "\\" in repl else repl
            leaf, v = _convert_tensor(kind, rest, np.asarray(value), pooled_shape[0:3])
            out[f"{prefix}.{leaf}"] = v
            matched = True
            break
        if not matched:
            unmatched.append(name)
    if unmatched:
        out["__unmatched__"] = unmatched
    return out


def apply_to_params(params: dict, flat: Dict[str, np.ndarray], strict: bool = False):
    """Write a flat {'path/to/module.leaf': array} map into a nested flax
    params dict (suffix-free exact paths). Returns (new_params, report).
    """
    import copy

    params = copy.deepcopy(jax_tree_to_numpy(params))
    loaded, missing, mismatched = [], [], []
    for key, value in flat.items():
        if key == "__unmatched__":
            continue
        path, leaf = key.rsplit(".", 1)
        node = params
        parts = path.split("/")
        try:
            for p in parts:
                node = node[p]
        except (KeyError, TypeError):
            missing.append(key)
            continue
        if leaf not in node:
            missing.append(key)
            continue
        if tuple(node[leaf].shape) != tuple(value.shape):
            mismatched.append((key, node[leaf].shape, value.shape))
            continue
        node[leaf] = value.astype(node[leaf].dtype)
        loaded.append(key)
    report = {"loaded": loaded, "missing": missing, "mismatched": mismatched}
    if strict and (missing or mismatched):
        raise ValueError(report)
    return params, report


def jax_tree_to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)


def load_torch_checkpoint(path: str, params: dict, transfer: bool = True):
    """Load a .pth checkpoint file into flax params (requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    flat = convert_state_dict(sd, transfer=transfer)
    return apply_to_params(params, flat)
