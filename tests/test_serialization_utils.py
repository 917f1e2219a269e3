import numpy as np

from mmt_psm_tpu.utils.env import collect_env_info
from mmt_psm_tpu.utils.model_serialization import align_by_suffix, flatten_params, unflatten_params


def test_flatten_roundtrip():
    tree = {"a": {"b": np.ones(2), "c": {"d": np.zeros(3)}}, "e": np.arange(4)}
    flat = flatten_params(tree)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    rt = unflatten_params(flat)
    np.testing.assert_array_equal(rt["a"]["c"]["d"], tree["a"]["c"]["d"])


def test_align_by_suffix_prefix_mismatch():
    model = {"backbone/body/stem/conv1/kernel": np.zeros((3, 3))}
    loaded = {"module.student.backbone.body.stem.conv1.kernel": np.ones((3, 3))}
    out, report = align_by_suffix(model, loaded)
    np.testing.assert_array_equal(out["backbone/body/stem/conv1/kernel"], 1)
    assert len(report["matched"]) == 1


def test_align_by_suffix_shape_guard():
    model = {"head/kernel": np.zeros((2, 2))}
    loaded = {"other.head.kernel": np.ones((3, 3))}
    out, report = align_by_suffix(model, loaded)
    np.testing.assert_array_equal(out["head/kernel"], 0)
    assert report["skipped"] == ["head/kernel"]


def test_collect_env_runs():
    info = collect_env_info()
    assert "jax" in info and "python" in info
