"""Build the ACTUAL torch reference model on CPU for composed parity tests.

Imports /root/reference's ``GeneralizedRCNN`` with:

* the CUDA extension replaced by CPU equivalents — greedy NMS via the
  transliterated oracle (tests/oracles.py vs csrc/cpu/nms_cpu.cpp) and a
  vectorized torch ROIAlign matching csrc/cpu/ROIAlign_cpu.cpp exactly;
* ``torch.Tensor.to('cuda:*')`` made a no-op (the reference hard-codes
  cuda:0/1 device hops — boxlist_ops.py:27-29,
  roi_box_feature_extractors.py:108-115, roi_mask_feature_extractors
  .py:134-140 — which are pure moves, identity on one device);
* yacs backed by mmt_psm_tpu.config.node (yacs isn't installed here);
* the reference's dead imports stubbed (SURVEY dead list: maskiou_head,
  utils.cuda_kmeans, torchvision VGG, pycocotools/skimage inside
  utils.miscellaneous — none used by the pap test path).

This lets one seeded weight set run through BOTH stacks end to end
(reference modeling/detector/generalized_rcnn.py:42-115).
"""

import sys
import types

import numpy as np

REFERENCE = "/root/reference"

_loaded = {}


def _stub(name, **attrs):
    if name not in sys.modules:
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
    return sys.modules[name]


def roi_align_cpu_torch(feat, rois, spatial_scale, pooled, sampling_ratio, chunk=128):
    """Vectorized CPU ROIAlign, bit-matching csrc/cpu/ROIAlign_cpu.cpp
    (same sample grid, border skip at y<-1/y>H, clamp, corner collapse).

    feat: [N, C, H, W] float tensor; rois: [K, 5] (batch_idx, x1..y2)
    image coords. Requires sampling_ratio > 0 (the pap configs use 2).
    Returns [K, C, pooled, pooled].
    """
    import torch

    assert sampling_ratio > 0
    N, C, H, W = feat.shape
    K = rois.shape[0]
    g = sampling_ratio
    if K == 0:
        return feat.new_zeros((0, C, pooled, pooled))
    feat_flat = feat.permute(0, 2, 3, 1).reshape(N * H * W, C)

    outs = []
    for s in range(0, K, chunk):
        r = rois[s : s + chunk]
        k = r.shape[0]
        b = r[:, 0].long()  # [k]
        sx = r[:, 1] * spatial_scale
        sy = r[:, 2] * spatial_scale
        ex = r[:, 3] * spatial_scale
        ey = r[:, 4] * spatial_scale
        rw = torch.clamp(ex - sx, min=1.0)
        rh = torch.clamp(ey - sy, min=1.0)
        bh = rh / pooled  # [k]
        bw = rw / pooled

        iy = (torch.arange(g, dtype=feat.dtype) + 0.5) / g  # [g]
        ph = torch.arange(pooled, dtype=feat.dtype)  # [P]
        # y coords [k, P, g]
        y = sy[:, None, None] + (ph[None, :, None] + iy[None, None, :]) * bh[:, None, None]
        x = sx[:, None, None] + (ph[None, :, None] + iy[None, None, :]) * bw[:, None, None]

        def corners(v, size):
            valid = (v >= -1.0) & (v <= size)
            vv = torch.clamp(v, min=0.0)
            lo = vv.long()
            collapse = lo >= size - 1
            lo = torch.where(collapse, torch.full_like(lo, size - 1), lo)
            hi = torch.where(collapse, lo, lo + 1)
            vv = torch.where(collapse, lo.to(v.dtype), vv)
            frac = vv - lo.to(v.dtype)
            return lo, hi, frac, valid

        y_lo, y_hi, ly, vy = corners(y, H)  # each [k, P, g]
        x_lo, x_hi, lx, vx = corners(x, W)
        hy, hx = 1.0 - ly, 1.0 - lx

        # combine: sample (pyi, pxj) for every (P,g) x (P,g)
        # weights [k, P, g, P, g]
        w00 = hy[:, :, :, None, None] * hx[:, None, None, :, :]
        w01 = hy[:, :, :, None, None] * lx[:, None, None, :, :]
        w10 = ly[:, :, :, None, None] * hx[:, None, None, :, :]
        w11 = ly[:, :, :, None, None] * lx[:, None, None, :, :]
        valid = (vy[:, :, :, None, None] & vx[:, None, None, :, :]).to(feat.dtype)

        base = (b * (H * W))[:, None, None, None, None]

        def gather(yi, xi):
            idx = base + yi[:, :, :, None, None] * W + xi[:, None, None, :, :]
            return feat_flat[idx.reshape(-1)].reshape(k, pooled, g, pooled, g, C)

        val = (
            gather(y_lo, x_lo) * w00[..., None]
            + gather(y_lo, x_hi) * w01[..., None]
            + gather(y_hi, x_lo) * w10[..., None]
            + gather(y_hi, x_hi) * w11[..., None]
        ) * valid[..., None]
        out = val.sum(dim=(2, 4)) / (g * g)  # [k, P, P, C]
        outs.append(out.permute(0, 3, 1, 2))
    return torch.cat(outs, dim=0)


def load_reference():
    """Import the reference package with CPU patches; returns a namespace
    with the model class, config factory, and helper structures. Cached."""
    if _loaded:
        return _loaded["ns"]

    import torch

    sys.dont_write_bytecode = True
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    def _raise(*a, **k):  # pragma: no cover
        raise RuntimeError("CUDA extension stub")

    _stub(
        "maskrcnn_benchmark._C",
        nms=_raise,
        roi_align_forward=_raise,
        roi_align_backward=_raise,
        roi_pool_forward=_raise,
        roi_pool_backward=_raise,
    )
    six = _stub("torch._six", int_classes=int, string_classes=str, PY3=True)
    torch._six = six
    # the reference predates numpy 1.24's alias removal
    for alias, typ in (("float", float), ("int", int), ("bool", bool), ("object", object)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)
    pc = _stub("pycocotools")
    pc.mask = _stub("pycocotools.mask")
    sk = _stub("skimage")
    sk.measure = _stub("skimage.measure")
    _stub("maskrcnn_benchmark.utils.cuda_kmeans", lloyd=None)

    class _FakeVGG:  # torchvision absent; reference only type-imports VGG
        pass

    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models", VGG=_FakeVGG)
    # roi_heads.py:6 imports a nonexistent maskiou_head (SURVEY dead list)
    mi_pkg = _stub("maskrcnn_benchmark.modeling.roi_heads.maskiou_head")
    _stub(
        "maskrcnn_benchmark.modeling.roi_heads.maskiou_head.maskiou_head",
        build_roi_maskiou_head=lambda cfg: None,
    )
    mi_pkg.maskiou_head = sys.modules[
        "maskrcnn_benchmark.modeling.roi_heads.maskiou_head.maskiou_head"
    ]

    # yacs shim -> our yacs-compatible node
    from mmt_psm_tpu.config.node import ConfigNode

    yacs = _stub("yacs")
    yacs.config = _stub("yacs.config", CfgNode=ConfigNode)

    # cuda-device no-op: the reference's .to('cuda:0') hops are identity
    # on a single device; on CPU they must not attempt a real move.
    orig_to = torch.Tensor.to

    def _to(self, *args, **kwargs):
        if args:
            t = args[0]
            if isinstance(t, str) and t.startswith("cuda"):
                return self
            if isinstance(t, torch.device) and t.type == "cuda":
                return self
        dev = kwargs.get("device")
        if isinstance(dev, str) and dev.startswith("cuda"):
            kwargs = dict(kwargs, device="cpu")
        elif isinstance(dev, torch.device) and dev.type == "cuda":
            kwargs = dict(kwargs, device="cpu")
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to

    # the relation-NMS TRAIN path casts via the legacy cuda tensor types
    # (relation_module.py:209-222, losses.py:66); on CPU the same cast
    # is the plain float type
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.LongTensor = torch.LongTensor
    torch.cuda.ByteTensor = torch.ByteTensor

    # ---- CPU NMS: patch boxlist_ops BEFORE dependent modules import it
    from oracles import nms_oracle

    from maskrcnn_benchmark.structures import boxlist_ops as blo

    def boxlist_nms_cpu(boxlist, nms_thresh, max_proposals=-1, score_field="score"):
        """boxlist_ops.boxlist_nms:9-35 with _box_nms = the CPU oracle."""
        if nms_thresh <= 0:
            return boxlist
        mode = boxlist.mode
        boxlist = boxlist.convert("xyxy")
        boxes = boxlist.bbox.detach().cpu().numpy().astype(np.float32)
        score = boxlist.get_field(score_field).detach().cpu().numpy().astype(np.float32)
        keep = torch.from_numpy(nms_oracle(boxes, score, nms_thresh))
        if max_proposals > 0:
            keep = keep[:max_proposals]
        boxlist = boxlist[keep]
        return boxlist.convert(mode)

    blo.boxlist_nms = boxlist_nms_cpu

    # ---- CPU ROIAlign: replace the autograd-Function wrapper's forward
    import maskrcnn_benchmark.layers  # noqa: F401 — ensure submodule import

    # the layers package re-exports a same-named function, shadowing the
    # submodule attribute; fetch the module object directly
    ra_mod = sys.modules["maskrcnn_benchmark.layers.roi_align"]

    def roi_align_forward_cpu(self, input, rois):
        out = self.output_size
        pooled = int(out[0] if isinstance(out, (tuple, list)) else out)
        return roi_align_cpu_torch(
            input.float(),
            rois.float(),
            float(self.spatial_scale),
            pooled,
            int(self.sampling_ratio),
        )

    ra_mod.ROIAlign.forward = roi_align_forward_cpu

    # now the model stack (binds the patched boxlist_nms)
    from maskrcnn_benchmark.config import cfg as ref_cfg_singleton
    from maskrcnn_benchmark.modeling.detector.generalized_rcnn import GeneralizedRCNN
    from maskrcnn_benchmark.structures.bounding_box import BoxList
    from maskrcnn_benchmark.structures.image_list import to_image_list

    def make_cfg(yaml_path=None, opts=()):
        cfg = ref_cfg_singleton.clone()
        if hasattr(cfg, "defrost"):
            cfg.defrost()
        if yaml_path:
            cfg.merge_from_file(yaml_path)
        if opts:
            cfg.merge_from_list(list(opts))
        return cfg

    ns = types.SimpleNamespace(
        GeneralizedRCNN=GeneralizedRCNN,
        make_cfg=make_cfg,
        BoxList=BoxList,
        to_image_list=to_image_list,
        boxlist_nms=boxlist_nms_cpu,
        roi_align=roi_align_cpu_torch,
    )
    _loaded["ns"] = ns
    return ns
