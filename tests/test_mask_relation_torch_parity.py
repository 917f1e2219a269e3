"""Golden parity: CIAM / CAM channel attention vs the reference's own
torch modules (reference: maskrcnn_benchmark/modeling/relation/
mask_relation_module.py:157-242) on seeded inputs.

The fixed-shape port masks same-class valid pairs instead of splitting
per class; with a single class and all-valid instances the two must
agree exactly.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from mmt_psm_tpu.models.mask_relation import _cam_attention, _ciam_attention

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_mod():
    sys.dont_write_bytecode = True
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if "maskrcnn_benchmark._C" not in sys.modules:
        fake = types.ModuleType("maskrcnn_benchmark._C")
        fake.nms = lambda *a, **k: None
        sys.modules["maskrcnn_benchmark._C"] = fake
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.int_classes, six.string_classes, six.PY3 = int, str, True
        sys.modules["torch._six"] = six
        torch._six = six
    if "maskrcnn_benchmark.utils.cuda_kmeans" not in sys.modules:
        # the reference file imports a nonexistent module (SURVEY dead
        # list: mask_relation_module.py:11)
        km = types.ModuleType("maskrcnn_benchmark.utils.cuda_kmeans")
        km.lloyd = None
        sys.modules["maskrcnn_benchmark.utils.cuda_kmeans"] = km
    # mask_head.loss imports vgg16 which loads a .pth at construction
    # only; importing the module is enough — but it pulls SegmentationMask
    # chains; stub it defensively
    if "maskrcnn_benchmark.modeling.roi_heads.mask_head.loss" not in sys.modules:
        try:
            import maskrcnn_benchmark.modeling.roi_heads.mask_head.loss  # noqa: F401
        except Exception:
            stub = types.ModuleType("maskrcnn_benchmark.modeling.roi_heads.mask_head.loss")
            stub.vgg16 = object
            sys.modules["maskrcnn_benchmark.modeling.roi_heads.mask_head.loss"] = stub
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "ref_mask_relation",
        os.path.join(REFERENCE, "maskrcnn_benchmark/modeling/relation/mask_relation_module.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except ImportError as e:  # vgg16 weight file etc.
        pytest.skip(f"reference module unimportable: {e}")
    return mod


def _x(n=6, c=8, h=5, w=5, seed=0):
    return np.random.default_rng(seed).normal(size=(n, c, h, w)).astype(np.float32)


def test_cam_golden(ref_mod):
    x = _x()
    cam = ref_mod.CAM_Module(8)
    with torch.no_grad():
        cam.gamma[:] = 0.7
        ref = cam(torch.as_tensor(x)).numpy()
    ours = np.asarray(
        _cam_attention(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray([0.7]))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("norm", [-1, 1])
@pytest.mark.parametrize("prenorm", [False, True])
def test_ciam_golden(ref_mod, norm, prenorm):
    from mmt_psm_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.RELATION_MASK.NORM = norm
    cfg.MODEL.RELATION_MASK.PRE_NORM = prenorm
    ciam = ref_mod.CIAM_Module(cfg)
    x = _x(seed=norm + 10)
    with torch.no_grad():
        ciam.gamma[:] = 0.4
        ref = ciam(torch.as_tensor(x)).numpy()
    n = x.shape[0]
    ours = np.asarray(
        _ciam_attention(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.ones(n, jnp.int32),  # single class
            jnp.ones(n, bool),
            jnp.asarray([0.4]),
            norm,
            prenorm,
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
