"""Batch assembly: host pipeline -> fixed-shape device batches.

Replaces the reference's DataLoader + collators (reference:
maskrcnn_benchmark/data/build.py:143-318, data/collate_batch.py:5-76):

* ``make_source_loader`` — labeled batches with the source transform
  (resize/flip/jitter/erase) padded to a static canvas and MAX_GT rows;
* ``make_unlabeled_loader`` — the mean-teacher K-aug batches: one
  shared geometric transform per patch, AUG_K teacher + AUG_S student
  color versions (BatchCollatorWoLabelK, collate_batch.py:58-76);
* ``make_test_loader`` — deterministic eval batches.

Iteration-based infinite cycling matches IterationBasedBatchSampler
(data/samplers/iteration_based_batch_sampler.py:5-31).
"""

from __future__ import annotations

import numpy as np

from . import transforms as T


def pad_to_canvas(sample: dict, canvas: int, max_gt: int, mask_size: int | None = None, pad_masks: bool = True) -> dict:
    """Place the (resized) image top-left on a [canvas, canvas] frame and
    pad GT arrays to fixed sizes.

    pad_masks=False keeps the instance masks as the ragged resized array
    (host-side eval only reads them per image; padding 64 canvas-sized
    planes per image costs ~70MB/image of pure memset)."""
    img = sample["image"]
    h, w = img.shape[:2]
    assert h <= canvas and w <= canvas, (h, w, canvas)
    # raw-u8 pipelines (device-side normalization) keep the canvas u8 —
    # 4x less host->device traffic; normalized pipelines stay f32
    dtype = np.uint8 if img.dtype == np.uint8 else np.float32
    out_img = np.zeros((canvas, canvas, 3), dtype)
    out_img[:h, :w] = img

    mask_size = mask_size or canvas
    boxes = np.zeros((max_gt, 4), np.float32)
    labels = np.zeros((max_gt,), np.int32)
    valid = np.zeros((max_gt,), bool)
    n = min(len(sample.get("boxes", [])), max_gt)
    if pad_masks:
        masks = np.zeros((max_gt, mask_size, mask_size), np.uint8)
    else:
        masks = np.asarray(sample.get("masks", np.zeros((0, h, w))), np.uint8)[:n]
    if n:
        boxes[:n] = sample["boxes"][:n]
        labels[:n] = sample["labels"][:n]
        valid[:n] = True
        if pad_masks:
            src = sample["masks"][:n]
            if mask_size == canvas:
                masks[:n, :h, :w] = src[:, :h, :w]
            else:
                step = canvas // mask_size
                for i in range(n):
                    m = np.zeros((canvas, canvas), np.uint8)
                    m[:h, :w] = src[i][:h, :w]
                    masks[i] = m[::step, ::step][:mask_size, :mask_size]
    return {
        "image": out_img,
        "boxes": boxes,
        "labels": labels,
        "gt_valid": valid,
        "masks": masks,
        "image_size": np.array([h, w], np.int32),
    }


def _stack(batch_list):
    out = {}
    for k in batch_list[0]:
        vals = [b[k] for b in batch_list]
        shapes = {np.shape(v) for v in vals}
        # ragged entries (unpadded eval masks) stay a python list
        out[k] = np.stack(vals) if len(shapes) == 1 else vals
    return out




def make_source_loader(
    dataset,
    batch_size: int,
    canvas: int,
    max_gt: int = 64,
    mask_size: int | None = None,
    min_size: int = 800,
    max_size: int = 1333,
    seed: int = 0,
    num_iterations: int | None = None,
    shuffle: bool = True,
):
    """Infinite (or bounded) iterator of labeled train batches."""
    rng = np.random.default_rng(seed)

    def gen():
        it = 0
        while num_iterations is None or it < num_iterations:
            order = rng.permutation(len(dataset)) if shuffle else np.arange(len(dataset))
            for start in range(0, len(order) - batch_size + 1, batch_size):
                samples = []
                for idx in order[start : start + batch_size]:
                    s = dataset[int(idx)]
                    s = T.source_transform(s, rng, min_size, max_size)
                    samples.append(pad_to_canvas(s, canvas, max_gt, mask_size))
                yield _stack(samples)
                it += 1
                if num_iterations is not None and it >= num_iterations:
                    return

    return gen()


def make_unlabeled_loader(
    dataset,
    batch_size: int,
    canvas: int,
    aug_k: int = 2,
    aug_s: int = 1,
    min_size: int = 800,
    max_size: int = 1333,
    seed: int = 1,
):
    """Infinite iterator of K-aug unlabeled batches:
    {"t_images": [B, K, H, W, 3], "s_images": [B, S, H, W, 3],
     "image_size": [B, 2]}."""
    rng = np.random.default_rng(seed)
    k_total = aug_k + aug_s

    def gen():
        while True:
            order = rng.permutation(len(dataset))
            for start in range(0, len(order) - batch_size + 1, batch_size):
                t_views, s_views, sizes = [], [], []
                for idx in order[start : start + batch_size]:
                    img = dataset[int(idx)]
                    views = T.unlabeled_transform({"image": img}, rng, k_total, min_size, max_size)
                    h, w = views[0].shape[:2]
                    padded = []
                    for v in views:
                        c = np.zeros((canvas, canvas, 3), np.float32)
                        c[:h, :w] = v
                        padded.append(c)
                    t_views.append(np.stack(padded[:aug_k]))
                    s_views.append(np.stack(padded[aug_k:]))
                    sizes.append([h, w])
                yield {
                    "t_images": np.stack(t_views),
                    "s_images": np.stack(s_views),
                    "image_size": np.asarray(sizes, np.int32),
                }

    return gen()


def make_tta_loader(
    dataset,
    batch_size: int,
    canvas: int,
    tta_k: int = 2,
    max_gt: int = 64,
    mask_size: int | None = None,
    min_size: int = 800,
    max_size: int = 1333,
    seed: int = 3,
):
    """Test-time-augmentation batches (TEST.TTA): per sample one geometric
    transform, ``tta_k`` color/erase views stacked under "tta_views" with
    view 0 duplicated as "image" (reference TTABatchCollator +
    build_transforms tta, data/build.py:301-302, transforms/build.py:65-79).

    Scope note: the reference's model accepts a ``tta`` flag but never
    reads it (generalized_rcnn.py:42) and its inference entry hardcodes
    tta=False (engine/inference.py:95) — TTA there is collation-only. We
    expose the same surface; consumers run views through run_inference
    individually and merge however they choose.
    """
    rng = np.random.default_rng(seed)

    def gen():
        n = len(dataset)
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            n_real = len(idxs)
            while len(idxs) < batch_size:
                idxs.append(idxs[-1])
            samples, views = [], []
            for idx in idxs:
                s = dataset[int(idx)]
                s = T.tta_transform(s, rng, tta_k, min_size, max_size)
                vs = s.pop("views")
                h, w = vs[0].shape[:2]
                padded = []
                for v in vs:
                    c = np.zeros((canvas, canvas, 3), np.float32)
                    c[:h, :w] = v
                    padded.append(c)
                views.append(np.stack(padded))
                s["image"] = vs[0]
                samples.append(pad_to_canvas(s, canvas, max_gt, mask_size))
            batch = _stack(samples)
            batch["tta_views"] = np.stack(views)  # [B, K, H, W, 3]
            batch["n_real"] = n_real
            yield batch

    return gen()


def make_test_loader(
    dataset,
    batch_size: int,
    canvas: int,
    max_gt: int = 64,
    mask_size: int | None = None,
    min_size: int = 800,
    max_size: int = 1333,
    raw_u8: bool = False,
):
    """Single-pass eval iterator (pads the final partial batch by
    repeating the last sample; consumers filter via n_real).

    raw_u8=True ships resized RGB uint8 canvases and leaves the
    BGR-flip + mean-subtract to the device (engine/inference.py's jitted
    infer) — a quarter of the f32 host->device bytes. Only valid with
    the default PIXEL_STD=1 normalization (asserted at the device side
    implicitly: the jit subtracts the mean only)."""

    def gen():
        n = len(dataset)
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            n_real = len(idxs)
            while len(idxs) < batch_size:
                idxs.append(idxs[-1])
            samples = []
            for idx in idxs:
                s = dataset[int(idx)]
                if raw_u8:
                    s = T.resize_sample(s, min_size, max_size)
                else:
                    s = T.test_transform(s, min_size, max_size)
                # eval masks stay ragged/unpadded — only the host reads them
                samples.append(pad_to_canvas(s, canvas, max_gt, mask_size, pad_masks=False))
            batch = _stack(samples)
            batch["n_real"] = n_real
            yield batch

    return gen()


class Prefetcher:
    """Background-thread batch prefetch — the TPU-host analog of the
    reference's multi-worker DataLoader (reference:
    maskrcnn_benchmark/data/build.py:166-181, NUM_WORKERS collate in
    separate processes). Here one daemon thread runs the wrapped
    iterator's batch assembly (windowing, resize, canvas pad, stack —
    pure numpy, which releases the GIL in its hot loops) so it overlaps
    the consumer's device dispatch/wait instead of serializing with it.

    A thread, not a process pool: batches are ~50 MB numpy arrays, and
    a process pool would pay pickle+pipe per batch (the measured reason
    eval WORKERS lose on few-core hosts, RESULTS.md round 3); the numpy
    batch crosses a thread boundary for free.

    Order-preserving; iterator exceptions re-raise at the consuming
    ``next()``. ``close()`` (also ``__exit__``) stops the thread early
    if the consumer abandons the sweep; otherwise it parks bounded by
    ``depth`` batches ahead (memory cap: depth x batch bytes).
    """

    _ITEM, _ERR, _END = 0, 1, 2

    def __init__(self, batches, depth: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=max(int(depth), 1))
        self._stop = threading.Event()
        self._done = False
        self._thread = threading.Thread(
            target=self._run, args=(iter(batches),), daemon=True
        )
        self._thread.start()

    def _run(self, it):
        import queue

        def put(msg):
            while not self._stop.is_set():
                try:
                    self._q.put(msg, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        try:
            for b in it:
                if not put((self._ITEM, b)):
                    return
        except BaseException as e:  # re-raised on the consumer side
            put((self._ERR, e))
            return
        put((self._END, None))

    def __iter__(self):
        return self

    def __next__(self):
        # the _END/_ERR sentinel arrives exactly once — latch it so a
        # next() after exhaustion (or after close()) raises
        # StopIteration instead of parking forever on an empty queue
        if self._done:
            raise StopIteration
        import queue

        while True:
            try:
                kind, val = self._q.get(timeout=0.1)
                break
            except queue.Empty:
                if self._stop.is_set():
                    self._done = True
                    raise StopIteration from None
        if kind == self._ITEM:
            return val
        self._done = True
        if kind == self._ERR:
            raise val
        raise StopIteration

    def close(self):
        self._stop.set()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def prefetch(batches, depth: int = 2):
    """Wrap a batch iterable in a :class:`Prefetcher` (depth 0: no-op).

    depth -1 = auto: 2 with a spare core, 0 on 1-core hosts — measured
    there the thread CONTENDS with the consumer (host-side transfer
    serialization shares the core) instead of overlapping it: 1.39 vs
    1.87 img/s end-to-end eval (RESULTS.md "Batch-assembly prefetch").
    Same policy as run_inference's eval_workers auto mode.
    """
    if depth < 0:
        depth = 2 if usable_cpus() >= 2 else 0
    return Prefetcher(batches, depth) if depth > 0 else batches


def usable_cpus() -> int:
    """CPUs this process can actually run on. ``os.cpu_count()`` reports
    the machine, ignoring CPU affinity/cgroup pinning — on a pinned
    1-core container of an 8-core host it would enable the prefetch
    thread exactly where it is a measured regression."""
    import os

    try:
        return len(os.sched_getaffinity(0)) or 1
    except AttributeError:  # non-Linux
        return os.cpu_count() or 1
