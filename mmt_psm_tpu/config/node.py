"""Minimal yacs-style config tree.

The reference drives everything from a yacs ``CfgNode`` singleton
(reference: maskrcnn_benchmark/config/defaults.py:21). We provide an
equivalent nested attribute-dict with YAML merge and dotted-list
override support so reference YAML configs and ``KEY VALUE`` CLI opts
keep working, without depending on yacs.
"""

from __future__ import annotations

import ast
import copy
from typing import Any

import yaml


class ConfigNode(dict):
    """Nested dict with attribute access, freezing, and yacs-style merging."""

    __slots__ = ()
    _FROZEN_KEY = "__frozen__"

    def __init__(self, init: dict | None = None):
        super().__init__()
        object.__setattr__  # noqa: B018 — slots only; state lives in the dict
        super().__setitem__(ConfigNode._FROZEN_KEY, False)
        if init:
            for k, v in init.items():
                self[k] = ConfigNode(v) if isinstance(v, dict) else v

    # -- attribute protocol ------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __setitem__(self, key: str, value: Any) -> None:
        if super().get(ConfigNode._FROZEN_KEY, False):
            raise AttributeError(f"ConfigNode is frozen; cannot set {key!r}")
        super().__setitem__(key, value)

    # -- freezing ----------------------------------------------------------
    def freeze(self) -> "ConfigNode":
        for v in self.values():
            if isinstance(v, ConfigNode):
                v.freeze()
        super().__setitem__(ConfigNode._FROZEN_KEY, True)
        return self

    def defrost(self) -> "ConfigNode":
        super().__setitem__(ConfigNode._FROZEN_KEY, False)
        for v in self.values():
            if isinstance(v, ConfigNode):
                v.defrost()
        return self

    def is_frozen(self) -> bool:
        return bool(super().get(ConfigNode._FROZEN_KEY, False))

    def clone(self) -> "ConfigNode":
        frozen = self.is_frozen()
        self.defrost()
        out = copy.deepcopy(self)
        if frozen:
            self.freeze()
        return out

    # -- merging -----------------------------------------------------------
    def merge_from_dict(self, other: dict) -> None:
        for k, v in other.items():
            if k == ConfigNode._FROZEN_KEY:
                continue
            if isinstance(v, dict) and isinstance(self.get(k), ConfigNode):
                self[k].merge_from_dict(v)
            else:
                cur = self.get(k, None)
                self[k] = _coerce(v, cur)

    def merge_from_file(self, path: str) -> None:
        with open(path) as f:
            data = yaml.safe_load(f)
        if data:
            self.merge_from_dict(data)

    def merge_from_list(self, opts: list) -> None:
        """yacs-style flat [KEY, VALUE, KEY, VALUE, ...] override list."""
        assert len(opts) % 2 == 0, f"override list must pair KEY VALUE: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            cur = node.get(parts[-1], None)
            node[parts[-1]] = _coerce(value, cur)

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            if k == ConfigNode._FROZEN_KEY:
                continue
            out[k] = v.to_dict() if isinstance(v, ConfigNode) else v
        return out

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=True)

    def __repr__(self) -> str:  # pragma: no cover
        return f"ConfigNode({self.to_dict()!r})"

    def __deepcopy__(self, memo):
        node = ConfigNode()
        for k, v in self.items():
            if k == ConfigNode._FROZEN_KEY:
                continue
            node[k] = copy.deepcopy(v, memo)
        return node


def _coerce(value: Any, current: Any) -> Any:
    """Parse string CLI/YAML values into python types, yacs-style."""
    if isinstance(value, str):
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
    # yacs tolerates tuple<->list; normalize to tuple when current is tuple
    if isinstance(current, tuple) and isinstance(value, list):
        value = tuple(value)
    if isinstance(current, list) and isinstance(value, tuple):
        value = list(value)
    # float fields accept ints
    if isinstance(current, float) and isinstance(value, int) and not isinstance(value, bool):
        value = float(value)
    return value
