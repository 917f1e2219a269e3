"""Prefetcher (data/loader.py): the background-thread batch-assembly
pipeline that overlaps host numpy with device time (the reference's
DataLoader NUM_WORKERS analog, maskrcnn_benchmark/data/build.py:166-181).

Contract under test: order preservation, exception propagation at the
consuming next(), bounded run-ahead, early close, and end-to-end use
through run_inference (which wraps its batch iterable by default).
"""

import threading
import time

import pytest

from mmt_psm_tpu.data.loader import Prefetcher, prefetch


def test_order_and_completeness():
    items = [{"i": i} for i in range(37)]
    out = list(prefetch(iter(items), depth=3))
    assert out == items


def test_depth_zero_is_noop():
    it = iter(range(3))
    assert prefetch(it, depth=0) is it


def test_exception_propagates_at_next():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_bounded_runahead():
    produced = []
    release = threading.Event()

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    it = Prefetcher(gen(), depth=2)
    # consume nothing: the thread may run at most depth ahead (+1 in
    # flight inside the generator before the blocking put)
    deadline = time.time() + 2.0
    while len(produced) < 3 and time.time() < deadline:
        time.sleep(0.01)
    time.sleep(0.1)
    assert len(produced) <= 4, produced
    assert next(it) == 0
    it.close()
    release.set()


def test_close_stops_thread():
    def gen():
        i = 0
        while True:
            yield i
            i += 1

    it = Prefetcher(gen(), depth=1)
    assert next(it) == 0
    it.close()
    deadline = time.time() + 2.0
    while it._thread.is_alive() and time.time() < deadline:
        time.sleep(0.01)
    assert not it._thread.is_alive()


def test_context_manager():
    with prefetch(iter([1, 2, 3]), depth=2) as it:
        assert next(it) == 1


def test_run_inference_prefetch_parity(tiny_model_and_batches):
    """run_inference(prefetch_depth=2) must produce bit-identical stats
    to the synchronous path (order-stable accumulation is part of the
    Prefetcher contract — PR-curve tie-breaking depends on it)."""
    model, params, make_batches = tiny_model_and_batches
    from mmt_psm_tpu.engine.inference import run_inference

    stats_sync, _ = run_inference(model, params, make_batches(), prefetch_depth=0)
    stats_pre, _ = run_inference(model, params, make_batches(), prefetch_depth=2)
    assert stats_sync == stats_pre


@pytest.fixture(scope="module")
def tiny_model_and_batches():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmt_psm_tpu.data.loader import make_test_loader
    from mmt_psm_tpu.data.pap import synthetic_slide_dataset
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig

    cfg = ModelConfig(image_size=128)
    model = MaskRCNN(config=cfg)
    ds = synthetic_slide_dataset(
        seed=3, num_slides=2, slide_size=256, win_size=128, overlap=0.0,
        is_train=False, num_cells=(3, 6),
    )

    def make_batches():
        return make_test_loader(ds, 2, 128, max_gt=16, min_size=128, max_size=128)

    first = next(make_batches())
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(first["image"][:1]),
        jnp.asarray(first["image_size"][:1]),
        train=False,
    )
    return model, params, make_batches


def test_trainer_prefetch_wrap_parity(tmp_path):
    """MTTrainer wraps its loaders in the Prefetcher per
    DATALOADER.PREFETCH_DEPTH; training through the threaded loader must
    produce bit-identical params to the synchronous one (order
    preservation through the queue is what guarantees it)."""
    import itertools

    import jax
    import numpy as np

    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.data.loader import Prefetcher
    from mmt_psm_tpu.engine.trainer import MTTrainer
    from mmt_psm_tpu.models import MaskRCNN

    from test_detector import TINY
    from test_parallel_trainer import _init_params, _np_batch

    model = MaskRCNN(config=TINY)
    batch_np = _np_batch(bsz=2)
    params = _init_params(model, batch_np)

    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 5e-5
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.CHECKPOINT_PERIOD = 10

    def run(depth):
        cfg.DATALOADER.PREFETCH_DEPTH = depth
        t = MTTrainer(
            model, params, cfg, itertools.repeat(batch_np),
            output_dir=str(tmp_path / f"run{depth}"),
        )
        if depth > 0:
            assert isinstance(t.source_loader, Prefetcher)
        else:
            assert not isinstance(t.source_loader, Prefetcher)
        t.train()
        return np.asarray(
            jax.device_get(t.state.params["box_extractor"]["fc6"]["kernel"])
        )

    np.testing.assert_array_equal(run(0), run(2))
