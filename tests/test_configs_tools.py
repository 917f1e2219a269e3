import os
import sys

import numpy as np

from mmt_psm_tpu.config import get_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_our_pap_config_loads_and_builds_model_config():
    cfg = get_cfg()
    cfg.merge_from_file("configs/pap/mmt_psm_r50_fpn.yaml")
    assert cfg.MODEL.RELATION_NMS.USE_RELATION_NMS is True
    assert cfg.MODEL.RELATION_MASK.USE_RELATION is True
    assert cfg.MT.LAMBDA == 5.0
    assert cfg.TPU.COMPUTE_DTYPE == "bfloat16"

    from mmt_psm_tpu.models import ModelConfig
    from mmt_psm_tpu.models.relation import RelationNMSConfig
    from mmt_psm_tpu.models.mask_relation import MaskRelationConfig
    from mmt_psm_tpu.train.mt_step import MTConfig

    mcfg = ModelConfig.from_cfg(cfg)
    assert mcfg.pooler_scales == (0.25, 0.125, 0.0625, 0.03125)
    rcfg = RelationNMSConfig.from_cfg(cfg)
    assert rcfg.first_n == 90 and rcfg.reg_iou is True
    mrcfg = MaskRelationConfig.from_cfg(cfg)
    assert mrcfg.type == "CIAM"
    mt = MTConfig.from_cfg(cfg)
    assert mt.lambda_ == 5.0 and mt.hard_neg is True


def test_split_folds():
    sys.path.insert(0, "tools")
    from split_set import split_folds

    names = [f"s{i}.png" for i in range(10)]
    folds = split_folds(names, 3, seed=1)
    assert sorted(len(f) for f in folds) == [3, 3, 4]
    flat = sorted(n for f in folds for n in f)
    assert flat == sorted(names)
    assert split_folds(names, 3, seed=1) == folds  # deterministic


def test_plot_metric_curves(tmp_path):
    """Checkpoint-sweep metric plots (reference tools/test_net.py:151-233)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "test_net_tool", os.path.join(REPO, "tools", "test_net.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fake = {"AJI_mean": 0.5, "mAP": 0.4, "AP50": 0.6, "AP75": 0.3, "AP85": 0.1}
    results = {"model_0000001": dict(fake), "model_0000002": dict(fake), "t_model_0000002": dict(fake)}
    mod.plot_metric_curves(results, str(tmp_path))
    assert os.path.isfile(os.path.join(tmp_path, "metrics.png"))


def test_webcam_tool_parses():
    """The webcam demo (reference demo/webcam.py) is importable and has
    the reference CLI surface; no camera in CI so main() is not run."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "webcam_tool", os.path.join(REPO, "tools", "webcam.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)
