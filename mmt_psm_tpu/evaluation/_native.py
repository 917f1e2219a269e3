"""ctypes bindings for the C++ eval kernels (csrc/papeval.cpp).

Compiled on demand with g++ (cached next to the source); every entry
point has a numpy fallback so the eval stack works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = os.path.join(root, "csrc", "papeval.cpp")
    so = os.path.join(root, "csrc", "libpapeval.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            # -ffp-contract=off: paste_resize_threshold must be
            # bit-identical to the numpy f32 interpolation (no FMA)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-ffp-contract=off",
                 "-shared", "-fPIC", "-o", so, src],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.pair_intersections.argtypes = [u8p, i64p, i64p, ctypes.c_int64] * 2 + [i64p]
        lib.pair_intersections.restype = None
        lib.mask_areas.argtypes = [u8p, i64p, i64p, ctypes.c_int64, i64p]
        lib.mask_areas.restype = None
        lib.rle_encode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, i64p]
        lib.rle_encode.restype = ctypes.c_int64
        lib.rle_decode.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, u8p]
        lib.rle_decode.restype = None
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.map_matches.argtypes = [
            f64p, ctypes.c_int64, ctypes.c_int64, f64p, ctypes.c_int64, f64p, f64p,
        ]
        lib.map_matches.restype = None
        lib.aji_match.argtypes = [
            f64p, f64p, f64p, ctypes.c_int64, ctypes.c_int64, f64p, f64p,
        ]
        lib.aji_match.restype = ctypes.c_double
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.paste_resize_threshold.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.paste_resize_threshold.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def _pack(masks, boxes):
    """Concatenate row-major u8 box-cropped masks + offsets."""
    offsets = np.zeros(len(masks), np.int64)
    total = 0
    for i, m in enumerate(masks):
        offsets[i] = total
        total += m.size
    data = np.empty(total, np.uint8)
    for i, m in enumerate(masks):
        data[offsets[i] : offsets[i] + m.size] = np.ascontiguousarray(m, np.uint8).ravel()
    return data, offsets, np.ascontiguousarray(boxes, np.int64)


def pair_intersections(dt_masks, dt_boxes, gt_masks, gt_boxes) -> np.ndarray:
    """[D, G] int64 intersection counts (native path)."""
    lib = _build_and_load()
    assert lib is not None
    d, g = len(dt_masks), len(gt_masks)
    out = np.zeros((d, g), np.int64)
    if d == 0 or g == 0:
        return out
    ddata, doff, dbox = _pack(dt_masks, dt_boxes)
    gdata, goff, gbox = _pack(gt_masks, gt_boxes)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.pair_intersections(
        ddata.ctypes.data_as(u8p), doff.ctypes.data_as(i64p), dbox.ctypes.data_as(i64p), d,
        gdata.ctypes.data_as(u8p), goff.ctypes.data_as(i64p), gbox.ctypes.data_as(i64p), g,
        out.ctypes.data_as(i64p),
    )
    return out


def rle_encode(mask: np.ndarray) -> np.ndarray:
    """Column-major RLE counts (pycocotools semantics) for an [H, W] mask."""
    lib = _build_and_load()
    h, w = mask.shape
    m = np.ascontiguousarray(mask != 0, np.uint8)
    if lib is None:
        flat = m.T.ravel()  # column-major scan
        edges = np.flatnonzero(np.diff(flat)) + 1
        runs = np.diff(np.concatenate([[0], edges, [flat.size]]))
        if flat.size and flat[0] == 1:
            runs = np.concatenate([[0], runs])
        return runs.astype(np.int64)
    counts = np.empty(h * w + 1, np.int64)
    n = lib.rle_encode(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return counts[:n].copy()


def map_matches(ious: np.ndarray, thrs: np.ndarray, n_dt: int, n_gt: int):
    """COCO-style greedy (dtm, gtm) per IoU threshold (native path).

    Bit-exact with the Python loops in pap_eval.cal_map_matches
    (reference pap_eval.py:480-509) — tie handling and the 1-1e-10
    clamp are replicated in csrc/papeval.cpp map_matches.
    """
    lib = _build_and_load()
    assert lib is not None
    t = len(thrs)
    dtm = np.zeros((t, n_dt), np.float64)
    gtm = np.zeros((t, n_gt), np.float64)
    if n_dt == 0 or n_gt == 0 or ious is None or np.size(ious) == 0:
        return dtm, gtm
    ious = np.ascontiguousarray(ious, np.float64)
    # n_dt/n_gt become raw pointer strides in C++ — a mismatch would
    # read/write out of bounds in native code.
    assert ious.shape == (n_dt, n_gt), (ious.shape, n_dt, n_gt)
    thrs = np.ascontiguousarray(thrs, np.float64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.map_matches(
        ious.ctypes.data_as(f64p), n_dt, n_gt,
        thrs.ctypes.data_as(f64p), t,
        dtm.ctypes.data_as(f64p), gtm.ctypes.data_as(f64p),
    )
    return dtm, gtm


def aji_match(ious, inter, union, dt_areas, gt_areas) -> float:
    """Per-image AJI via the greedy per-gt match (native path); exact
    semantics of pap_eval.compute_aji (reference pap_eval.py:573-630)."""
    lib = _build_and_load()
    assert lib is not None
    if ious is None or np.size(ious) == 0:
        return 0.0
    ious = np.ascontiguousarray(ious, np.float64)
    assert ious.ndim == 2, ious.shape
    d, g = ious.shape
    f64p = ctypes.POINTER(ctypes.c_double)
    inter = np.ascontiguousarray(inter, np.float64)
    union = np.ascontiguousarray(union, np.float64)
    dt_areas = np.ascontiguousarray(dt_areas, np.float64)
    gt_areas = np.ascontiguousarray(gt_areas, np.float64)
    assert inter.shape == (d, g) and union.shape == (d, g), (inter.shape, union.shape)
    assert len(dt_areas) == d and len(gt_areas) == g, (len(dt_areas), len(gt_areas), d, g)
    return float(
        lib.aji_match(
            ious.ctypes.data_as(f64p), inter.ctypes.data_as(f64p),
            union.ctypes.data_as(f64p), d, g,
            dt_areas.ctypes.data_as(f64p), gt_areas.ctypes.data_as(f64p),
        )
    )


def paste_resize_threshold(
    probs: np.ndarray, pad: int, bh: int, bw: int,
    oy0: int, oy1: int, ox0: int, ox1: int, threshold: float,
) -> np.ndarray:
    """Clipped window of the padded-map bilinear resize, thresholded —
    the Masker paste hot loop (engine/paste.py). Bit-identical to the
    numpy `_bilinear_resize(padded, bh, bw) > thr` on the same window
    (asserted by tests/test_native_scoring.py)."""
    lib = _build_and_load()
    assert lib is not None
    m = probs.shape[-1]
    probs = np.ascontiguousarray(probs, np.float32)
    assert probs.shape == (m, m), probs.shape
    out = np.empty((oy1 - oy0, ox1 - ox0), np.uint8)
    lib.paste_resize_threshold(
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m, pad, bh, bw, oy0, oy1, ox0, ox1,
        ctypes.c_float(threshold),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.view(bool)


def rle_decode(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    lib = _build_and_load()
    counts = np.ascontiguousarray(counts, np.int64)
    if lib is None:
        flat = np.zeros(h * w, np.uint8)
        pos = 0
        v = 0
        for c in counts:
            if v:
                flat[pos : pos + c] = 1
            pos += int(c)
            v ^= 1
        return flat.reshape(w, h).T.copy()
    out = np.empty((h, w), np.uint8)
    lib.rle_decode(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(counts), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
