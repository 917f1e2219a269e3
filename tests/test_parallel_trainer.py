"""Data-parallel training: SPMD loss parity across mesh sizes, and the
MTTrainer mesh/resume integration (VERDICT r1 items 1-2, 6).

The reference's "distributed" path never synchronized gradients
(reference: tools/train_mean_teacher.py:136-140, utils/comm.py) — these
tests pin down the real-DP behavior the TPU build adds: the same global
batch must produce the same loss and the same updated params whether it
runs on 1 device or sharded over 8.
"""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmt_psm_tpu.config import get_cfg
from mmt_psm_tpu.data.synthetic import generate_batch, normalize_image
from mmt_psm_tpu.engine.trainer import MTTrainer, mesh_size_for
from mmt_psm_tpu.models import MaskRCNN
from mmt_psm_tpu.parallel import make_mesh, replicate, shard_batch
from mmt_psm_tpu.train.optim import make_optimizer
from mmt_psm_tpu.train.supervised import create_train_state, make_supervised_step

from test_detector import TINY, _batch


def _np_batch(bsz=2, seed=0):
    b = generate_batch(seed, bsz, image_size=128, max_instances=16)
    b["image"] = normalize_image(b["image"])
    return b


def _init_params(model, batch):
    from mmt_psm_tpu.train.supervised import batch_to_gt

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    return model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        jb["image"], jb["image_size"], batch_to_gt(jb), train=True,
    )["params"]


def test_mesh_size_for_caps_to_batch_divisor():
    cfg = get_cfg()
    cfg.SOLVER.IMS_PER_BATCH = 6
    n = mesh_size_for(cfg, 6)
    assert 6 % n == 0 and n >= 1
    cfg.TPU.MESH_SHAPE = (4,)
    assert mesh_size_for(cfg, 8) == 4
    assert mesh_size_for(cfg, 3) in (1, 3)


@pytest.mark.slow
def test_dp_loss_parity_1_vs_8_devices():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    model = MaskRCNN(config=TINY)
    batch_np = _np_batch(bsz=8)
    params = _init_params(model, batch_np)

    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 5e-5
    cfg.SOLVER.WARMUP_ITERS = 0
    tx, _ = make_optimizer(cfg, params)
    step = jax.jit(make_supervised_step(model, tx, ema_alpha=0.99, ema_start=0))
    rng = jax.random.PRNGKey(7)

    results = {}
    for n in (1, 8):
        mesh = make_mesh(n)
        state = replicate(create_train_state(params, tx, with_teacher=True), mesh)
        batch = shard_batch({k: jnp.asarray(v) for k, v in batch_np.items()}, mesh)
        with mesh:
            state, metrics = step(state, batch, replicate(rng, mesh))
        results[n] = (
            float(metrics["loss_total"]),
            np.asarray(jax.device_get(state.params["box_extractor"]["fc6"]["kernel"])),
        )

    np.testing.assert_allclose(results[1][0], results[8][0], rtol=2e-5)
    np.testing.assert_allclose(results[1][1], results[8][1], rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_trainer_mesh_and_resume_roundtrip(tmp_path):
    model = MaskRCNN(config=TINY)
    batch_np = _np_batch(bsz=2)
    params = _init_params(model, batch_np)

    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 5e-5
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.CHECKPOINT_PERIOD = 2

    def loader():
        return itertools.repeat(batch_np)

    out = str(tmp_path / "run")
    t1 = MTTrainer(model, params, cfg, loader(), output_dir=out)
    assert t1.mesh.size == 2  # batch 2 over the 8-device env caps at 2
    t1.train()
    step_after = int(jax.device_get(t1.state.step))
    assert step_after == 3
    p1 = np.asarray(jax.device_get(t1.state.params["box_extractor"]["fc6"]["kernel"]))

    # fresh trainer from the ORIGINAL params resumes from model_final
    t2 = MTTrainer(model, params, cfg, loader(), output_dir=out)
    start = t2.resume()
    assert start == 3
    p2 = np.asarray(jax.device_get(t2.state.params["box_extractor"]["fc6"]["kernel"]))
    np.testing.assert_array_equal(p1, p2)
    # optimizer momentum restored too: one more identical step matches a
    # non-resumed 4th step bit-for-bit
    cfg2 = cfg.clone() if hasattr(cfg, "clone") else cfg
    t1.max_iter = 4
    t2.max_iter = 4
    t1.train(start_iter=3)
    t2.train(start_iter=start)
    a = np.asarray(jax.device_get(t1.state.params["box_extractor"]["fc6"]["kernel"]))
    b = np.asarray(jax.device_get(t2.state.params["box_extractor"]["fc6"]["kernel"]))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)


def test_from_cfg_builds_flagship_graph():
    """ModelConfig.from_cfg is the single source of truth for the IR-Net
    head switches (VERDICT r1 item 4; reference generalized_rcnn.py:86-91:
    relation-NMS replaces the box post-processor at test time)."""
    cfg = get_cfg()
    cfg.merge_from_file("configs/pap/mmt_psm_r50_fpn.yaml")
    from mmt_psm_tpu.models import ModelConfig

    train_cfg = ModelConfig.from_cfg(cfg)
    assert train_cfg.with_relation_nms and train_cfg.relation is not None
    assert train_cfg.with_relation_mask and train_cfg.relation_mask is not None
    assert train_cfg.with_hint_adaptor  # MT.FG_HINT > 0 in the flagship config

    eval_cfg = ModelConfig.from_cfg(cfg, train=False)
    assert eval_cfg.with_relation_nms and eval_cfg.relation is not None
    assert eval_cfg.with_relation_mask
    assert not eval_cfg.with_hint_adaptor  # MGD adaptor is train-only


@pytest.mark.slow
def test_dp_inference_parity_1_vs_8_devices():
    """Eval sharded over the mesh must score identically to single-device
    (the reference split eval across ranks + gathered,
    engine/inference.py:44-67; XLA SPMD replaces the tmpdir gather)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from mmt_psm_tpu.data.loader import make_test_loader
    from mmt_psm_tpu.data.pap import synthetic_slide_dataset
    from mmt_psm_tpu.engine.inference import run_inference

    model = MaskRCNN(config=TINY)
    batch_np = _np_batch(bsz=8)
    params = {"params": _init_params(model, batch_np)}
    ds = synthetic_slide_dataset(seed=5, num_slides=2, slide_size=256, win_size=128, overlap=0.0, is_train=False)

    def loader():
        return make_test_loader(ds, 8, 128, max_gt=16, min_size=128, max_size=128)

    stats_1, _ = run_inference(model, params, loader())
    stats_8, _ = run_inference(model, params, loader(), mesh=make_mesh(8))
    assert stats_1["AJI"] == stats_8["AJI"]
    assert stats_1["mAP"] == stats_8["mAP"]
