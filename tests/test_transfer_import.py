"""COCO-init transfer import against the reference's REAL key space.

The reference initializes both student and teacher from
``e2e_mask_rcnn_R_50_FPN_1x.pth`` with the class-count-dependent heads
stripped (tools/train_mean_teacher.py:41-43, checkpoint.py:148-160).
The actual .pth is unavailable here, so per VERDICT r2 missing item 4
we build the full-shape equivalent from the reference's OWN torch
modules (tests/ref_stack.py constructs the real GeneralizedRCNN): an
81-class COCO-shaped state dict with the exact reference key space,
round-tripped through utils/torch_import in transfer mode into the
3-class pap model.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))
import ref_stack

from mmt_psm_tpu.config import get_cfg
from mmt_psm_tpu.models import MaskRCNN, ModelConfig
from mmt_psm_tpu.utils.torch_import import TRANSFER_SKIP, apply_to_params, convert_state_dict

YAML = "/root/reference/configs/pap/e2e_mask_rcnn_R_50_FPN_1x.yaml"


def test_coco_shaped_transfer_roundtrip():
    ref = ref_stack.load_reference()
    # the COCO-pretrained donor: NUM_CLASSES=81, plain Mask R-CNN (no
    # relation heads) — the e2e_mask_rcnn_R_50_FPN_1x graph
    cfg = ref.make_cfg(
        YAML,
        [
            "MODEL.ROI_BOX_HEAD.NUM_CLASSES", "81",
            "MODEL.RELATION_NMS.USE_RELATION_NMS", "False",
            "MODEL.RELATION_MASK.USE_RELATION", "False",
        ],
    )
    torch.manual_seed(0)
    donor = ref.GeneralizedRCNN(cfg)
    sd = {k: v.detach().numpy() for k, v in donor.state_dict().items()}
    # simulate the DataParallel prefix some published checkpoints carry
    sd = {"module." + k: v for k, v in sd.items()}

    flat = convert_state_dict(sd, transfer=True)
    # class-count heads must be dropped in transfer mode
    for k in flat:
        assert not any(s in k for s in TRANSFER_SKIP), k
    unmatched = [
        k for k in flat.get("__unmatched__", []) if "anchor_generator.cell_anchors" not in k
    ]
    assert not unmatched, unmatched[:8]

    # load into the 3-class pap model (relation heads ON — their params
    # simply stay at init, like the reference's fresh heads)
    ycfg = get_cfg()
    ycfg.merge_from_file(YAML)
    ycfg.merge_from_list(["TPU.IMAGE_SIZE", "128"])
    mycfg = ModelConfig.from_cfg(ycfg, train=False)
    model = MaskRCNN(config=mycfg)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    sizes = jnp.asarray([[128, 128]], jnp.int32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes, train=False)
    )()
    params, report = apply_to_params(variables["params"], flat)
    assert not report["mismatched"], report["mismatched"][:8]
    # every backbone/rpn/box/mask trunk tensor must land
    loaded = set(report["loaded"])
    for probe in (
        "backbone/body/stem/conv1",
        "fpn",
        "rpn/conv",
        "box_extractor/fc6",
        "mask_extractor/mask_fcn1",
    ):
        assert any(probe in k for k in loaded), probe
    # the stripped heads + fresh relation modules are the only missing
    for k in report["missing"]:
        assert any(
            t in k
            for t in (
                "cls_score", "bbox_pred", "mask_logits", "relation", "hint_adaptor",
            )
        ), k

    # the imported trunk runs
    dets = jax.jit(lambda p: model.apply({"params": p}, images, sizes, train=False))(params)
    assert np.isfinite(np.asarray(dets.scores)).all()
