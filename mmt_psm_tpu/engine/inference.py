"""Inference engine: batched device inference -> host eval records.

Mirrors the reference flow (reference:
maskrcnn_benchmark/engine/inference.py:16-125 +
data/datasets/evaluation/pap/pap_eval.py:79-143
prepare_for_pap_segmentation): the model emits 28x28 mask probabilities
per detection (POSTPROCESS_MASKS=False, config/defaults.py:215); the
host pastes them into image space at threshold 0.5 and hands
box-cropped instance masks to the Papeval stack.
"""

from __future__ import annotations

import functools
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ..evaluation.instmask import InstSeg  # noqa: F401 -- re-export
from ..evaluation.pap_eval import PapEvaluator
from .paste import (  # noqa: F401 -- paste helpers moved to a jax-free module
    _bilinear_resize,
    detections_to_instseg,
    gt_to_instseg,
    paste_mask_crop,
)


def check_expected_results(stats: dict, expected_results, sigma_tol: float = 4):
    """Statistical regression check (reference TEST.EXPECTED_RESULTS,
    config/defaults.py:397-398, plumbed through engine/inference.py:77-78
    into the upstream COCO results checker): each entry is
    ``(metric, mean, std)`` with ``metric`` a ``/``-joined path into the
    stats dict (e.g. "AJI/2" or "mAP/all"). Returns a list of
    (metric, actual, lo, hi, ok); raises AssertionError if any fail."""
    report = []
    failed = []
    for metric, mean, std in expected_results:
        node = stats
        for part in str(metric).split("/"):
            key = part
            if isinstance(node, dict) and key not in node:
                try:
                    key = int(part)
                except ValueError:
                    pass
            node = node[key]
        actual = float(node)
        lo, hi = mean - sigma_tol * std, mean + sigma_tol * std
        ok = lo <= actual <= hi
        report.append((metric, actual, lo, hi, ok))
        if not ok:
            failed.append(f"{metric}: {actual:.4f} outside [{lo:.4f}, {hi:.4f}]")
    if failed:
        raise AssertionError("; ".join(failed))
    return report


@functools.cache
def _cached_infer(model):
    """One jitted inference fn per model: flax modules hash by their
    (frozen) config, so a checkpoint sweep over the same graph compiles
    once instead of once per checkpoint (~4 min each at the 1024
    flagship). Mask probabilities transfer as f16 — halves the dominant
    host transfer (the 28x28 prob maps) with error ~5e-4 on a [0, 1]
    quantity pasted at threshold 0.5."""

    @jax.jit
    def infer(p, images, sizes):
        if images.dtype == jnp.uint8:
            # raw RGB u8 straight off the loader (make_test_loader
            # raw_u8=True): BGR-flip + mean-subtract ON DEVICE. Ships a
            # quarter of the f32 bytes host->device — the dominant eval
            # cost on PCIe/tunnel transports. (The reference normalizes
            # on host, transforms.py:95-99; PIXEL_STD=1 assumed.)
            from ..data.transforms import PIXEL_MEAN_BGR

            images = images[..., ::-1].astype(jnp.float32) - jnp.asarray(PIXEL_MEAN_BGR)
            # zero the canvas beyond image_size: the f32 path normalizes
            # BEFORE zero-padding, so pad pixels are 0 there — a bare
            # device mean-subtract would leave them at -mean and shift
            # backbone features inside the pad's receptive field
            yy = jnp.arange(images.shape[1])[None, :, None, None]
            xx = jnp.arange(images.shape[2])[None, None, :, None]
            inside = (yy < sizes[:, 0][:, None, None, None]) & (
                xx < sizes[:, 1][:, None, None, None]
            )
            images = jnp.where(inside, images, 0.0)
        d = model.apply(p, images, sizes, train=False)
        masks = d.masks.astype(jnp.float16) if d.masks is not None else None
        return d.boxes, d.scores, d.labels, d.valid, masks, d.head_ids

    return infer


def run_inference(
    model,
    params,
    batches,
    categories=(1, 2),
    max_dets: int = 200,
    mesh=None,
    evaluator=None,
    visual_num: int = 0,
    visual_dir: str | None = None,
    mat_dir: str | None = None,
    eval_workers: int = 0,
    prefetch_depth: int = -1,
):
    """Eval loop: jitted inference per batch, Papeval accumulation on host.

    batches: iterable of dicts with image/image_size (+ gt arrays for
    evaluation). Returns (stats dict, timing dict).

    mesh: optional 1-D data mesh — params replicate, batches shard on
    the leading axis, so eval throughput scales over chips the way the
    reference's multi-GPU eval split work across ranks
    (engine/inference.py:44-67 + comm.scatter_gather; here XLA SPMD
    replaces the tmpdir gather).
    evaluator: alternative metric accumulator with add_image/summarize
    (the reference dispatches by dataset type, evaluation/__init__.py:7-32
    — see mmt_psm_tpu.evaluation.evaluate for the dataset-level entry).
    visual_num/visual_dir: render prediction overlays for the first N
    images (TEST.VISUAL_NUM, reference pap_eval.py:49-77).
    mat_dir: write per-image instance label maps as .mat files (the
    reference ISBI export, tools/test_net.py:109-121 + get_mat_output).
    eval_workers: >0 farms the per-image paste+scoring (the ~250 ms/img
    host bottleneck) to a spawn process pool (engine/_eval_worker.py);
    GT conversion stays in-process so full-frame bitmasks never cross
    the pipe. Requires the default PapEvaluator. -1 = auto: one worker
    per spare core, and SERIAL on hosts without spare cores (measured:
    on a 1-core host any pool is strictly slower than serial; on
    multi-core the per-image work scales ~linearly per worker).
    prefetch_depth: batch assembly (resize/pad/stack numpy) runs in a
    background thread up to this many batches ahead (data/loader.py
    Prefetcher — the DataLoader-workers analog), overlapping the
    device wait instead of serializing with it. 0 = synchronous.
    -1 = auto: depth 2 on hosts with a spare core, synchronous on
    1-core hosts (measured there: the thread CONTENDS with the
    host-side transfer serialization instead of overlapping it —
    1.39 vs 1.87 img/s, RESULTS.md "Batch-assembly prefetch").
    """

    infer = _cached_infer(model)

    if mesh is not None:
        from ..parallel import replicate

        params = replicate(params, mesh)

    nms_type = getattr(getattr(model, "config", None), "nms_type", "greedy")
    nms_thresh = getattr(getattr(model, "config", None), "nms_thresh", 0.5)
    num_classes = getattr(getattr(model, "config", None), "num_classes", 3)

    def dispatch(batch):
        if mesh is not None:
            from ..parallel import shard_batch

            device_in = shard_batch(
                {"image": np.asarray(batch["image"]), "image_size": np.asarray(batch["image_size"])},
                mesh,
            )
        else:
            device_in = {"image": batch["image"], "image_size": batch["image_size"]}
        return infer(params, device_in["image"], device_in["image_size"])

    if eval_workers < 0:
        from ..data.loader import usable_cpus

        ncpu = usable_cpus()  # affinity/cgroup-aware, not os.cpu_count()
        eval_workers = max(ncpu - 1, 0) if ncpu > 2 else 0
    pool = None
    if eval_workers > 0 and evaluator is None:
        import multiprocessing as mp
        import os
        from concurrent.futures import ProcessPoolExecutor

        from . import _eval_worker

        # spawn the workers NOW, inside an env window that (a) drops the
        # TPU-plugin sitecustomize path + platform pin so children never
        # touch the device tunnel, and (b) points PYTHONPATH at this
        # repo so the worker module imports in non-installed layouts.
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        saved = {
            k: os.environ.get(k)
            for k in ("PYTHONPATH", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
        }
        try:
            os.environ["PYTHONPATH"] = repo_root
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)
            pool = ProcessPoolExecutor(
                max_workers=eval_workers, mp_context=mp.get_context("spawn")
            )
            # submitting N tasks forces all N processes to start (env is
            # snapshotted at process start); no need to wait for them —
            # they boot while device inference warms up
            for _ in range(eval_workers):
                pool.submit(_eval_worker.ping)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    evaluator = evaluator or PapEvaluator(categories=categories, max_dets=max_dets)
    # image-ordered result slots: either a Future (pool path) or a
    # ready list of ImageResult rows (serial path) — keeps accumulation
    # order, and therefore tie-breaking in the mergesort PR curves,
    # independent of worker count
    result_slots = []
    n_images = 0
    # stage accounting (seconds) — reported in the timing dict so a slow
    # eval names its own bottleneck (loader pull / device wait+readback /
    # gt conversion / paste+score)
    acc = {"loader": 0.0, "device": 0.0, "gt": 0.0, "score": 0.0}
    t0 = time.perf_counter()
    # single-stage pipeline: batch i+1 executes on device while the host
    # pastes and scores batch i (a per-batch sync would serialize device
    # time with the host eval); batch ASSEMBLY additionally runs ahead in
    # the Prefetcher thread, so the "loader" stage below times only the
    # residual queue wait
    if prefetch_depth != 0:
        from ..data.loader import prefetch as _prefetch

        batches = _prefetch(batches, prefetch_depth)
    try:
        it = iter(batches)
        batch = next(it, None)
        pending = dispatch(batch) if batch is not None else None
        while batch is not None:
            t_l = time.perf_counter()
            next_batch = next(it, None)
            next_pending = dispatch(next_batch) if next_batch is not None else None
            t_d = time.perf_counter()
            acc["loader"] += t_d - t_l
            boxes, scores, labels, valid, masks, head_ids = jax.device_get(pending)
            acc["device"] += time.perf_counter() - t_d
            masks16 = None
            if masks is None:
                # box-only model (MASK_ON=False): box-filled 1x1 probs so the
                # shared InstSeg conversion applies
                masks = np.ones(boxes.shape[:2] + (1, 1), np.float32)
            else:
                # masks travel as f16 (half the transfer); numpy f16 math is
                # scalar-slow, so widen once on host (workers get the f16
                # copy — half the pickle bytes — and widen themselves)
                masks16 = np.asarray(masks)
                masks = np.asarray(masks, np.float32)
            # the test loader pads the final partial batch by repeating the
            # last sample; only score the real ones
            n_real = int(batch.get("n_real", boxes.shape[0]))
            for i in range(n_real):
                v_i = valid[i]
                if nms_type == "set" and head_ids is not None:
                    # K_HEAD>1 host set-NMS (reference box_head/inference.py:120-122)
                    from ..models.box_head import set_nms_filter

                    v_i = set_nms_filter(
                        boxes[i], scores[i], labels[i], v_i, head_ids[i],
                        nms_thresh=nms_thresh, num_classes=num_classes,
                    )
                t_g = time.perf_counter()
                gt = gt_to_instseg(
                    np.asarray(batch["boxes"][i]),
                    np.asarray(batch["labels"][i]),
                    np.asarray(batch["gt_valid"][i]),
                    np.asarray(batch["masks"][i]),
                )
                acc["gt"] += time.perf_counter() - t_g
                t_s = time.perf_counter()
                want_render = (visual_dir and n_images < visual_num) or mat_dir
                if pool is not None and not want_render:
                    from . import _eval_worker

                    result_slots.append(
                        pool.submit(
                            _eval_worker.eval_one,
                            (
                                boxes[i], scores[i], labels[i], v_i,
                                masks16[i] if masks16 is not None else masks[i],
                                tuple(np.asarray(batch["image_size"][i]).tolist()),
                                gt, evaluator.categories, evaluator.max_dets,
                                evaluator.use_iou,
                            ),
                        )
                    )
                    acc["score"] += time.perf_counter() - t_s
                    n_images += 1
                    continue
                dt = detections_to_instseg(
                    boxes[i], scores[i], labels[i], v_i, masks[i], batch["image_size"][i]
                )
                if visual_dir and n_images < visual_num:
                    import os

                    from ..data.transforms import PIXEL_MEAN_BGR
                    from ..utils.visual import overlay_instances

                    from PIL import Image

                    h_i, w_i = int(batch["image_size"][i][0]), int(batch["image_size"][i][1])
                    im = np.asarray(batch["image"][i][:h_i, :w_i])
                    if im.dtype == np.uint8:  # raw_u8 loader: already RGB
                        rgb = im
                    else:
                        rgb = np.clip((im + PIXEL_MEAN_BGR)[..., ::-1], 0, 255).astype(np.uint8)
                    ov = overlay_instances(rgb, {"masks": dt})
                    os.makedirs(visual_dir, exist_ok=True)
                    Image.fromarray(ov).save(os.path.join(visual_dir, f"vis_{n_images:04d}.png"))
                if mat_dir:
                    import os

                    from ..utils.mat_output import save_mat_output

                    h_i, w_i = int(batch["image_size"][i][0]), int(batch["image_size"][i][1])
                    os.makedirs(mat_dir, exist_ok=True)
                    save_mat_output(dt, h_i, w_i, os.path.join(mat_dir, f"img_{n_images:04d}.mat"))
                if pool is not None:
                    before = len(evaluator.results)
                    evaluator.add_image(dt, gt)
                    result_slots.append(evaluator.results[before:])
                    del evaluator.results[before:]
                else:
                    evaluator.add_image(dt, gt)
                acc["score"] += time.perf_counter() - t_s
                n_images += 1
            batch, pending = next_batch, next_pending
    finally:
        # stop the Prefetcher thread even if paste/scoring raised
        # mid-sweep — otherwise it parks in its put() retry loop for
        # the process lifetime, pinning depth x ~50MB batches
        close = getattr(batches, "close", None)
        if close is not None:
            close()
    if pool is not None:
        for slot in result_slots:
            rows = slot.result() if hasattr(slot, "result") else slot
            evaluator.results.extend(rows)
        pool.shutdown()
    # multi-host: merge per-image rows across processes (the reference's
    # tmpdir scatter_gather at engine/inference.py:44-67 + comm.py:81-147;
    # here a pickle all_gather over the fabric), rank-major so stats are
    # deterministic
    from ..parallel import comm as _comm

    if _comm.get_world_size() > 1 and hasattr(evaluator, "results"):
        gathered = _comm.all_gather(evaluator.results)
        evaluator.results = [row for rows in gathered for row in rows]
    dt_total = time.perf_counter() - t0
    stats = evaluator.summarize()
    return stats, {
        "images": n_images,
        "seconds": dt_total,
        "images_per_sec": n_images / max(dt_total, 1e-9),
        "stage_seconds": {k: round(v, 2) for k, v in acc.items()},
    }
