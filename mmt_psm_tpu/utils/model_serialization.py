"""Suffix-matching state-dict alignment.

Port of the reference's loader glue (reference:
maskrcnn_benchmark/utils/model_serialization.py:10-60): when loading a
checkpoint whose keys carry different prefixes (e.g. "module.",
"student.backbone" vs "backbone"), each model key is matched to the
loaded key with the longest common *suffix*, and shapes must agree.
Operates on flat {path: array} maps (see utils/torch_import.py
apply_to_params for writing back into a nested tree).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def flatten_params(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def align_by_suffix(model_flat: Dict[str, np.ndarray], loaded_flat: Dict[str, np.ndarray]):
    """For each model key, pick the loaded key with the longest matching
    suffix (model_serialization.py:10-45). Returns (updated_flat, report).
    """
    loaded_keys = list(loaded_flat)
    out = dict(model_flat)
    matched, skipped = [], []
    for mk in model_flat:
        best, best_len = None, 0
        for lk in loaded_keys:
            # compare suffix path components
            a = mk.split("/")
            b = lk.replace(".", "/").split("/")
            n = 0
            while n < min(len(a), len(b)) and a[-1 - n] == b[-1 - n]:
                n += 1
            if n > best_len:
                best, best_len = lk, n
        if best is None or best_len == 0:
            skipped.append(mk)
            continue
        lv = np.asarray(loaded_flat[best])
        if lv.shape != model_flat[mk].shape:
            skipped.append(mk)
            continue
        out[mk] = lv.astype(model_flat[mk].dtype)
        matched.append((mk, best))
    return out, {"matched": matched, "skipped": skipped}
