"""Golden parity: IR-Net RelationModule attention vs the reference's
own torch implementation (reference: maskrcnn_benchmark/modeling/
relation/relation_module.py:13-90) on seeded weights and inputs.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

N, C, D, G, GEO, TOPK = 32, 2, 1024, 16, 64, 10


@pytest.fixture(scope="module")
def ref_module():
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
    from maskrcnn_benchmark.modeling.relation.relation_module import RelationModule

    torch.manual_seed(7)
    mod = RelationModule(
        appearance_feature_dim=D, geo_feature_dim=GEO, fc_dim=(GEO, G),
        group=G, dim=(D, D, D), topk=TOPK,
    )
    mod.eval()
    return mod


def test_relation_attention_golden(ref_module):
    from mmt_psm_tpu.models.relation import RelationAttention as OurRelation

    rng = np.random.default_rng(3)
    f_a = rng.normal(size=(N, C, D)).astype(np.float32)
    # positive geometric embeddings (the reference takes log(clip(WG out)))
    pos = np.abs(rng.normal(size=(C, N, N, GEO))).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_module(
            torch.as_tensor(f_a), torch.as_tensor(pos.reshape(-1, GEO)), None
        ).numpy()

    ours = OurRelation(dim=(D, D, D), group=G, topk=TOPK)
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(f_a), jnp.asarray(pos), jnp.ones((N, C), bool)
    )

    # port the torch weights: Linear weight [out, in] -> kernel [in, out];
    # grouped 1x1 conv [out, in/g, 1, 1] -> [1, 1, in/g, out]
    sd = {k: v.detach().numpy() for k, v in ref_module.state_dict().items()}
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    for lin in ("WG", "WK", "WQ"):
        p[lin]["kernel"] = sd[f"{lin}.weight"].T
        p[lin]["bias"] = sd[f"{lin}.bias"]
    p["conv1"]["kernel"] = sd["conv1.weight"].transpose(2, 3, 1, 0)
    p["conv1"]["bias"] = sd["conv1.bias"]

    out = np.asarray(
        ours.apply({"params": p}, jnp.asarray(f_a), jnp.asarray(pos), jnp.ones((N, C), bool))
    )
    assert out.shape == ref_out.shape == (N, C, D)
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-4)
