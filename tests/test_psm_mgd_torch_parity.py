"""Golden parity: PSM / MGD / ODKD / FFI losses vs the reference's own
pure-torch functions on random inputs (VERDICT r2 item 5).

Reference functions under test:
* ``FastRCNNLossComputation.evaluatePSM`` + ``cls_loss`` + ``sharpen``
  (maskrcnn_benchmark/modeling/roi_heads/box_head/loss.py:164-315) —
  teacher K-view mean/std, hard-negative pos:neg=2:1 selection, soft-CE
  with sharpening and negative balance weight;
* ``evaluateODKD`` (box_head/loss.py:239-255);
* ``fg_hint_loss`` / ``ffi_hint_loss`` / ``naive_hint_loss``
  (modeling/detector/generalized_rcnn.py:243-307) — masked feature MSE
  with flip-aware teacher/student view pairing.

The box-head losses import cleanly with the CUDA ext stubbed; the hint
losses are module-level functions in generalized_rcnn.py whose module
graph needs CUDA+dataset deps, so they are ast-extracted from the
reference source and executed with the reference's own
``batch_hfilp``/``_hflip`` helpers (utils/miscellaneous.py:37-58).
"""

import ast
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from mmt_psm_tpu.train.mt_step import (
    MTConfig,
    ffi_hint_loss,
    mgd_loss,
    naive_hint_loss,
    odkd_loss,
    psm_loss,
)

REFERENCE = "/root/reference"


def _stub(name, **attrs):
    if name not in sys.modules:
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref():
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
    # utils/miscellaneous.py imports pycocotools + skimage, neither of
    # which the hint-loss helpers use; stub them so the module imports.
    pc = _stub("pycocotools")
    pc.mask = _stub("pycocotools.mask")
    sk = _stub("skimage")
    sk.measure = _stub("skimage.measure")

    from maskrcnn_benchmark.modeling.roi_heads.box_head import loss as ref_box_loss
    from maskrcnn_benchmark.structures.bounding_box import BoxList
    from maskrcnn_benchmark.utils import miscellaneous as ref_misc

    # ast-extract the three hint-loss functions from generalized_rcnn.py
    # (its module graph needs the full model stack; the functions are
    # self-contained over torch/F/_hflip/batch_hfilp).
    src_path = REFERENCE + "/maskrcnn_benchmark/modeling/detector/generalized_rcnn.py"
    with open(src_path) as f:
        src = f.read()
    tree = ast.parse(src)
    wanted = {"fg_hint_loss", "ffi_hint_loss", "naive_hint_loss"}
    ns = {
        "torch": torch,
        "F": torch.nn.functional,
        "_hflip": ref_misc._hflip,
        "batch_hfilp": ref_misc.batch_hfilp,
    }
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in wanted:
            code = compile(ast.Module(body=[node], type_ignores=[]), src_path, "exec")
            exec(code, ns)
    assert wanted <= set(ns)
    return types.SimpleNamespace(
        box_loss=ref_box_loss, BoxList=BoxList, hints=ns
    )


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _mt_cfg(**over):
    """The production MT block (reference scripts/train_mt.sh:7-17)."""
    d = dict(
        TEMP=0.5,
        CLS_LOSS_TYPE="bce",
        SHARPEN=True,
        RANK_FILTER=0.2,
        HARD_NEG=True,
        CLS_BALANCE_WEIGHT=1.5,
    )
    d.update(over)
    return _NS(MT=_NS(**d))


def _make_psm_inputs(n, n_pos, k_teacher=2, s_views=2, c=3, seed=0):
    rng = np.random.default_rng(seed)
    labels = np.zeros(n, np.int32)
    pos_idx = rng.choice(n, size=n_pos, replace=False)
    labels[pos_idx] = rng.integers(1, c, size=n_pos)
    t_logits = [rng.normal(size=(n, c)).astype(np.float32) * 3 for _ in range(k_teacher)]
    s_logits = [rng.normal(size=(n, c)).astype(np.float32) * 3 for _ in range(s_views)]
    return labels, t_logits, s_logits


def _ref_psm(ref, cfg, labels, t_logits, s_logits):
    evaluator = ref.box_loss.FastRCNNLossComputation(None, None, None, cfg=cfg)
    boxes = torch.zeros((len(labels), 4))
    p = ref.BoxList(boxes, (64, 64), mode="xyxy")
    p.add_field("labels", torch.as_tensor(labels, dtype=torch.int64))
    with torch.no_grad():
        out = evaluator.evaluatePSM(
            [torch.as_tensor(x) for x in s_logits],
            [torch.as_tensor(x) for x in t_logits],
            [p],
        )
    return float(out)


def _our_psm(mt, labels, t_logits, s_logits, c=3):
    out = psm_loss(
        [jnp.asarray(x)[None] for x in s_logits],
        [jnp.asarray(x)[None] for x in t_logits],
        jnp.asarray(labels)[None],
        jnp.ones((1, len(labels)), bool),
        mt,
        c,
    )
    return float(out)


@pytest.mark.parametrize(
    "n,n_pos,seed",
    [
        (64, 20, 0),
        (64, 1, 1),   # n_pos=1 -> zero hard negatives kept
        (64, 17, 2),  # odd n_pos -> floor(n_pos/2)
        (16, 15, 3),  # n_neg < n_pos//2 -> keep all negatives
        (48, 9, 4),
    ],
)
def test_psm_golden(ref, n, n_pos, seed):
    labels, t_logits, s_logits = _make_psm_inputs(n, n_pos, seed=seed)
    got = _our_psm(MTConfig(), labels, t_logits, s_logits)
    want = _ref_psm(ref, _mt_cfg(), labels, t_logits, s_logits)
    assert got == pytest.approx(want, abs=1e-5), (got, want)


def test_psm_golden_no_sharpen_soft_neg(ref):
    """SHARPEN off + HARD_NEG off (random negative subsample): with
    every negative kept on both sides the permutation doesn't matter, so
    force n_neg <= n_pos//2."""
    labels, t_logits, s_logits = _make_psm_inputs(24, 18, seed=5)
    mt = MTConfig(sharpen=False, hard_neg=False, cls_balance_weight=1.0)
    got = _our_psm(mt, labels, t_logits, s_logits)
    want = _ref_psm(
        ref, _mt_cfg(SHARPEN=False, HARD_NEG=False, CLS_BALANCE_WEIGHT=1.0),
        labels, t_logits, s_logits,
    )
    assert got == pytest.approx(want, abs=1e-5), (got, want)


def test_psm_no_positive_is_finite_zero():
    """n_pos=0: the reference's empty-cat mean is NaN, but that state is
    unreachable there — a teacher with no pseudo boxes raises and the
    unlabeled pair is skipped (MTtrainer.py:258-265). The fixed-shape
    port must stay finite (0) so the jitted step never NaNs."""
    labels, t_logits, s_logits = _make_psm_inputs(32, 0, seed=6)
    got = _our_psm(MTConfig(), labels, t_logits, s_logits)
    assert np.isfinite(got) and got == pytest.approx(0.0, abs=1e-6)


def test_odkd_golden(ref):
    labels, t_logits, s_logits = _make_psm_inputs(40, 12, k_teacher=1, s_views=1, seed=7)
    evaluator = ref.box_loss.FastRCNNLossComputation(None, None, None, cfg=_mt_cfg())
    boxes = torch.zeros((len(labels), 4))
    p = ref.BoxList(boxes, (64, 64), mode="xyxy")
    p.add_field("labels", torch.as_tensor(labels, dtype=torch.int64))
    with torch.no_grad():
        want = float(
            evaluator.evaluateODKD(
                [torch.as_tensor(s_logits[0])], [p], [torch.as_tensor(t_logits[0])]
            )
        )
    got = float(
        odkd_loss(
            jnp.asarray(s_logits[0])[None],
            jnp.asarray(t_logits[0])[None],
            jnp.asarray(labels)[None],
            jnp.ones((1, len(labels)), bool),
        )
    )
    assert got == pytest.approx(want, abs=1e-6), (got, want)


# ------------------------------------------------------------------ MGD


def _feat_views(rng, n_views, b, c, sizes):
    """n_views NCHW pyramids (torch) and their NHWC mirrors (jax)."""
    tv, jv = [], []
    for _ in range(n_views):
        levels_t, levels_j = [], []
        for h in sizes:
            x = rng.normal(size=(b, c, h, h)).astype(np.float32)
            levels_t.append(torch.as_tensor(x))
            levels_j.append(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        tv.append(levels_t)
        jv.append(tuple(levels_j))
    return tv, jv


@pytest.mark.parametrize("s_views", [1, 2])
def test_fg_hint_golden(ref, s_views):
    """fg_hint_loss (generalized_rcnn.py:243-282) vs mgd_loss: 2K=4
    teacher views (odd = flipped), S student views, 2 FPN levels,
    integral canvas with overlap counts."""
    rng = np.random.default_rng(11)
    b, c, canvas_hw = 2, 8, 32
    teacher_t, teacher_j = _feat_views(rng, 4, b, c, sizes=(16, 8))
    student_t, student_j = _feat_views(rng, s_views, b, c, sizes=(16, 8))
    canvas = (rng.random((b, canvas_hw, canvas_hw)) < 0.4).astype(np.float32)
    canvas += (rng.random((b, canvas_hw, canvas_hw)) < 0.1)  # overlaps -> counts 2

    with torch.no_grad():
        want = float(
            ref.hints["fg_hint_loss"](
                teacher_t,
                student_t,
                [torch.as_tensor(canvas[i]) for i in range(b)],
            )
        )
    got = float(mgd_loss(teacher_j, student_j, jnp.asarray(canvas), MTConfig()))
    assert got == pytest.approx(want, rel=1e-5), (got, want)


def test_ffi_hint_golden(ref):
    rng = np.random.default_rng(12)
    b, c = 2, 8
    teacher_t, teacher_j = _feat_views(rng, 1, b, c, sizes=(16, 8))
    student_t, student_j = _feat_views(rng, 1, b, c, sizes=(16, 8))
    canvas = (rng.random((b, 32, 32)) < 0.5).astype(np.float32)
    with torch.no_grad():
        want = float(
            ref.hints["ffi_hint_loss"](
                teacher_t[0],
                student_t[0],
                [torch.as_tensor(canvas[i]) for i in range(b)],
            )
        )
    got = float(ffi_hint_loss(teacher_j[0], student_j[0], jnp.asarray(canvas)))
    assert got == pytest.approx(want, rel=1e-5), (got, want)


def test_naive_hint_golden(ref):
    rng = np.random.default_rng(13)
    teacher_t, teacher_j = _feat_views(rng, 1, 2, 8, sizes=(16, 8))
    student_t, student_j = _feat_views(rng, 1, 2, 8, sizes=(16, 8))
    with torch.no_grad():
        want = float(ref.hints["naive_hint_loss"](teacher_t[0], student_t[0]))
    got = float(naive_hint_loss(teacher_j[0], student_j[0]))
    assert got == pytest.approx(want, rel=1e-5), (got, want)
