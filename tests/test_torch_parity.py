"""Golden numeric parity against the ACTUAL torch reference.

Instantiates the reference's own modules (from /root/reference, with the
CUDA extension stubbed — none of the modules under test touch it),
pushes one seeded state dict through utils/torch_import.py, and asserts
the flax model reproduces the torch outputs on a fixed input:

* backbone + FPN: per-level P2..P6 feature RMSE (reference
  modeling/backbone/resnet.py:61-307, fpn.py:7-74) — the SURVEY §7
  stage-2 exit criterion;
* RPN head conv outputs (modeling/rpn/rpn.py:14-46);
* box head fc6/fc7 MLP + FPNPredictor on identical pooled features
  (roi_box_feature_extractors.py:107-125, roi_box_predictors.py:36-62);
* mask head conv stack + deconv predictor
  (roi_mask_feature_extractors.py:131-146, roi_mask_predictors.py:9-36).

The detection post-processing path (NMS / ROIAlign) is covered
separately by exact-parity tests against transliterated CPU oracles
(tests/oracles.py vs csrc/cpu/nms_cpu.cpp, ROIAlign_cpu.cpp) since the
reference's own device path requires the CUDA extension.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mmt_psm_tpu.utils.torch_import import apply_to_params, convert_state_dict

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference torch modules with the CUDA ext stubbed."""
    sys.dont_write_bytecode = True  # never write __pycache__ into /root/reference
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if "maskrcnn_benchmark._C" not in sys.modules:
        fake = types.ModuleType("maskrcnn_benchmark._C")

        def _stub(*a, **k):  # pragma: no cover
            raise RuntimeError("CUDA extension stub")

        for name in (
            "nms",
            "roi_align_forward",
            "roi_align_backward",
            "roi_pool_forward",
            "roi_pool_backward",
        ):
            setattr(fake, name, _stub)
        sys.modules["maskrcnn_benchmark._C"] = fake
    from maskrcnn_benchmark.modeling.backbone import fpn as ref_fpn
    from maskrcnn_benchmark.modeling.backbone import resnet as ref_resnet

    return types.SimpleNamespace(resnet=ref_resnet, fpn=ref_fpn)


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _ref_cfg():
    """Minimal attribute shim for the cfg keys ResNet reads
    (resnet.py:70-106); values = the pap R-50-FPN config."""
    return _NS(
        MODEL=_NS(
            RESNETS=_NS(
                STEM_FUNC="StemWithFixedBatchNorm",
                TRANS_FUNC="BottleneckWithFixedBatchNorm",
                NUM_GROUPS=1,
                WIDTH_PER_GROUP=64,
                STEM_OUT_CHANNELS=64,
                RES2_OUT_CHANNELS=256,
                STRIDE_IN_1X1=True,
            ),
            BACKBONE=_NS(CONV_BODY="R-50-FPN", FREEZE_CONV_BODY_AT=2, OUT_CHANNELS=256),
        )
    )


class _M(torch.nn.Module):
    def __init__(self):
        super().__init__()


class _RefRPNHead(torch.nn.Module):
    """The reference RPNHead verbatim in structure+forward (rpn.py:26-46;
    importing the module itself drags in skimage via rpn/loss.py)."""

    def __init__(self, in_channels=256, num_anchors=3):
        super().__init__()
        self.conv = torch.nn.Conv2d(in_channels, in_channels, 3, 1, 1)
        self.cls_logits = torch.nn.Conv2d(in_channels, num_anchors, 1, 1)
        self.bbox_pred = torch.nn.Conv2d(in_channels, num_anchors * 4, 1, 1)

    def forward(self, feats):
        logits, bbox_reg = [], []
        for f in feats:
            t = torch.nn.functional.relu(self.conv(f))
            logits.append(self.cls_logits(t))
            bbox_reg.append(self.bbox_pred(t))
        return logits, bbox_reg


def _randomize(module: torch.nn.Module, seed: int = 0):
    """Seeded nontrivial values for every param AND buffer (FrozenBN
    buffers included) so layout bugs can't hide behind zeros/ones."""
    gen = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            continue
        if "running_var" in k:
            sd[k] = torch.rand(v.shape, generator=gen) * 2.0 + 0.5
        else:
            sd[k] = torch.randn(v.shape, generator=gen) * 0.05
    module.load_state_dict(sd)
    return module


def _rmse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)) / (np.std(b) + 1e-12))


@pytest.fixture(scope="module")
def torch_backbone(ref):
    from collections import OrderedDict

    cfg = _ref_cfg()
    body = ref.resnet.ResNet(cfg)
    fpn = ref.fpn.FPN(
        in_channels_list=[256, 512, 1024, 2048],
        out_channels=256,
        top_blocks=ref.fpn.LastLevelMaxPool(),
    )
    backbone = torch.nn.Sequential(OrderedDict([("body", body), ("fpn", fpn)]))
    root = _M()
    root.backbone = backbone
    root.rpn = _M()
    root.rpn.head = _RefRPNHead(256, 3)
    _randomize(root)
    root.eval()
    return root


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(7)
    # BGR255-mean-subtracted scale, like the real input pipeline
    return rng.normal(0.0, 50.0, (1, 3, 128, 128)).astype(np.float32)


@pytest.fixture(scope="module")
def flax_model_and_params(torch_backbone, image):
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig

    model = MaskRCNN(config=ModelConfig(image_size=128, compute_dtype="float32"))
    images = jnp.asarray(image.transpose(0, 2, 3, 1))

    def bb_and_rpn(m, im):
        feats = m.backbone_features(im)
        return m.rpn_raw(feats)

    params = model.init({"params": jax.random.PRNGKey(0)}, images, method=bb_and_rpn)["params"]
    sd = {k: v.numpy() for k, v in torch_backbone.state_dict().items()}
    flat = convert_state_dict(sd)
    assert "__unmatched__" not in flat, flat.get("__unmatched__")
    params, report = apply_to_params({"backbone": params["backbone"], "rpn": params["rpn"]}, flat)
    assert not report["missing"], report["missing"]
    assert not report["mismatched"], report["mismatched"]
    return model, params, images


@pytest.mark.slow
def test_backbone_fpn_feature_parity(ref, torch_backbone, image, flax_model_and_params):
    with torch.no_grad():
        ref_feats = torch_backbone.backbone(torch.from_numpy(image))
    assert len(ref_feats) == 5

    model, params, images = flax_model_and_params
    ours = model.apply({"params": params}, images, method=model.backbone_features)
    assert len(ours) == 5
    for lvl, (rf, of) in enumerate(zip(ref_feats, ours)):
        rf = rf.numpy().transpose(0, 2, 3, 1)
        of = np.asarray(of, np.float32)
        assert of.shape == rf.shape, (lvl, of.shape, rf.shape)
        err = _rmse(of, rf)
        assert err < 1e-5, f"P{lvl+2} RMSE {err}"


@pytest.mark.slow
def test_rpn_head_parity(ref, torch_backbone, image, flax_model_and_params):
    with torch.no_grad():
        ref_feats = torch_backbone.backbone(torch.from_numpy(image))
        ref_obj, ref_reg = torch_backbone.rpn.head(ref_feats)

    model, params, images = flax_model_and_params

    def bb_and_rpn(m, im):
        return m.rpn_raw(m.backbone_features(im))

    obj, reg = model.apply({"params": params}, images, method=bb_and_rpn)
    for lvl in range(5):
        ro = ref_obj[lvl].numpy().transpose(0, 2, 3, 1)
        rr = ref_reg[lvl].numpy().transpose(0, 2, 3, 1)
        assert _rmse(np.asarray(obj[lvl]), ro) < 1e-5
        assert _rmse(np.asarray(reg[lvl]), rr) < 1e-5


def test_box_head_mlp_parity(ref):
    """fc6/fc7 + predictor on identical pooled features. Replicates the
    reference forward after the pooler (roi_box_feature_extractors.py:
    118-125: flatten -> relu(fc6) -> dropout -> relu(fc7);
    roi_box_predictors.py:55-61: cls_score / bbox_pred linears)."""
    from mmt_psm_tpu.models import box_head as BH

    root = _M()
    root.roi_heads = _M()
    root.roi_heads.box = _M()
    fe = _M()
    fe.fc6 = torch.nn.Linear(256 * 7 * 7, 1024)
    fe.fc7 = torch.nn.Linear(1024, 1024)
    root.roi_heads.box.feature_extractor = fe
    pred = _M()
    pred.cls_score = torch.nn.Linear(1024, 3)
    pred.bbox_pred = torch.nn.Linear(1024, 12)
    root.roi_heads.box.predictor = pred
    _randomize(root, seed=1)

    rng = np.random.default_rng(3)
    pooled = rng.normal(0, 1, (8, 256, 7, 7)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(pooled).view(8, -1)
        x = torch.nn.functional.relu(fe.fc6(x))
        x = torch.nn.functional.relu(fe.fc7(x))
        ref_logits = pred.cls_score(x).numpy()
        ref_reg = pred.bbox_pred(x).numpy()

    extractor = BH.FPN2MLPExtractor(mlp_dim=1024, dropout=0.0)
    predictor = BH.FPNPredictor(num_classes=3)
    pooled_hwc = jnp.asarray(pooled.transpose(0, 2, 3, 1))
    e_params = extractor.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pooled_hwc, deterministic=True,
    )["params"]
    feats0 = extractor.apply({"params": e_params}, pooled_hwc, deterministic=True)
    p_params = predictor.init(jax.random.PRNGKey(2), feats0)["params"]

    sd = {k: v.numpy() for k, v in root.state_dict().items()}
    flat = convert_state_dict(sd)
    tree, report = apply_to_params(
        {"box_extractor": e_params, "box_predictor": p_params}, flat
    )
    assert not report["missing"] and not report["mismatched"], report

    feats = extractor.apply({"params": tree["box_extractor"]}, pooled_hwc, deterministic=True)
    logits, regs = predictor.apply({"params": tree["box_predictor"]}, feats)
    assert _rmse(np.asarray(logits), ref_logits) < 1e-5
    assert _rmse(np.asarray(regs), ref_reg) < 1e-5


def test_mask_head_parity(ref):
    """Mask conv stack + deconv predictor on identical pooled features
    (roi_mask_feature_extractors.py:131-146: relu(mask_fcnN);
    roi_mask_predictors.py:29-36: relu(conv5_mask) -> mask_fcn_logits)."""
    from mmt_psm_tpu.models import mask_head as MH

    root = _M()
    root.roi_heads = _M()
    root.roi_heads.mask = _M()
    fe = _M()
    for i in range(1, 5):
        setattr(fe, f"mask_fcn{i}", torch.nn.Conv2d(256, 256, 3, 1, 1))
    root.roi_heads.mask.feature_extractor = fe
    pred = _M()
    pred.conv5_mask = torch.nn.ConvTranspose2d(256, 256, 2, 2, 0)
    pred.mask_fcn_logits = torch.nn.Conv2d(256, 3, 1, 1, 0)
    root.roi_heads.mask.predictor = pred
    _randomize(root, seed=2)

    rng = np.random.default_rng(4)
    pooled = rng.normal(0, 1, (6, 256, 14, 14)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(pooled)
        for i in range(1, 5):
            x = torch.nn.functional.relu(getattr(fe, f"mask_fcn{i}")(x))
        x = torch.nn.functional.relu(pred.conv5_mask(x))
        ref_logits = pred.mask_fcn_logits(x).numpy()

    extractor = MH.MaskRCNNFPNExtractor()
    predictor = MH.MaskRCNNC4Predictor(num_classes=3)
    pooled_hwc = jnp.asarray(pooled.transpose(0, 2, 3, 1))
    e_params = extractor.init(jax.random.PRNGKey(0), pooled_hwc)["params"]
    x0 = extractor.apply({"params": e_params}, pooled_hwc)
    p_params = predictor.init(jax.random.PRNGKey(1), x0)["params"]

    sd = {k: v.numpy() for k, v in root.state_dict().items()}
    flat = convert_state_dict(sd)
    tree, report = apply_to_params(
        {"mask_extractor": e_params, "mask_predictor": p_params}, flat
    )
    assert not report["missing"] and not report["mismatched"], report

    x = extractor.apply({"params": tree["mask_extractor"]}, pooled_hwc)
    logits = predictor.apply({"params": tree["mask_predictor"]}, x)
    assert _rmse(np.asarray(logits), ref_logits.transpose(0, 2, 3, 1)) < 1e-5
