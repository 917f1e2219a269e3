"""Host-side augmentation pipeline (numpy).

Reimplements the reference transform set (reference:
maskrcnn_benchmark/data/transforms/transforms.py:10-205) on numpy RGB
uint8 images + fixed-shape target dicts:

* Resize with the square fast path (:40-43): min side -> MIN_SIZE
  capped by MAX_SIZE;
* RandomHorizontalFlip (image, boxes, masks);
* AdjustBrightness/Contrast/Hue with the build-time jitter magnitudes
  (brightness 0.15, contrast 0.15, hue 0.05 — transforms/build.py:36-50);
* RandomErasing: 0-10 tiny pixel-noise patches, area in
  [0.001, 0.004] x image (:146-205);
* Normalize: RGB->BGR, x255 semantics collapse to "BGR float - mean"
  since inputs here are already 0-255 (:95-99).

The reference composes augmentations over PIL images + BoxList targets;
here a sample is {"image": u8 [H,W,3] RGB, "boxes": [M,4], "labels",
"masks": [M,Hm,Wm] u8, "gt_valid"}. Color ops match
torchvision.transforms.functional formulas.
"""

from __future__ import annotations

import numpy as np

PIXEL_MEAN_BGR = np.array([102.9801, 115.9465, 122.7717], np.float32)


# ------------------------------------------------------------ color ops
def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(img.astype(np.float32) * factor, 0, 255).astype(img.dtype)


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    # torchvision: blend with mean of grayscale
    gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]).mean()
    out = img.astype(np.float32) * factor + gray * (1 - factor)
    return np.clip(out, 0, 255).astype(img.dtype)


def adjust_gamma(img: np.ndarray, gamma: float, gain: float = 1.0) -> np.ndarray:
    out = 255.0 * gain * (img.astype(np.float32) / 255.0) ** gamma
    return np.clip(out, 0, 255).astype(img.dtype)


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    gray = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    out = img.astype(np.float32) * factor + gray[..., None] * (1 - factor)
    return np.clip(out, 0, 255).astype(img.dtype)


def adjust_hue(img: np.ndarray, hue_factor: float) -> np.ndarray:
    """Shift hue by hue_factor (in [-0.5, 0.5]) via HSV round trip."""
    hsv = _rgb_to_hsv(img.astype(np.float32) / 255.0)
    hsv[..., 0] = (hsv[..., 0] + hue_factor) % 1.0
    out = _hsv_to_rgb(hsv) * 255.0
    return np.clip(out, 0, 255).astype(img.dtype)


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = np.max(rgb, axis=-1)
    minc = np.min(rgb, axis=-1)
    v = maxc
    d = maxc - minc
    s = np.where(maxc > 0, d / np.maximum(maxc, 1e-10), 0.0)
    rc = np.where(d > 0, (maxc - r) / np.maximum(d, 1e-10), 0.0)
    gc = np.where(d > 0, (maxc - g) / np.maximum(d, 1e-10), 0.0)
    bc = np.where(d > 0, (maxc - b) / np.maximum(d, 1e-10), 0.0)
    h = np.where(maxc == r, bc - gc, np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    return np.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = (i.astype(np.int32) % 6)[..., None]
    out = np.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [
            np.stack([v, t, p], -1),
            np.stack([q, v, p], -1),
            np.stack([p, v, t], -1),
            np.stack([p, q, v], -1),
            np.stack([t, p, v], -1),
            np.stack([v, p, q], -1),
        ],
    )
    return out


# ------------------------------------------------------------- geometry
def resize_sample(sample: dict, min_size: int, max_size: int) -> dict:
    """Reference Resize semantics (transforms.py:25-72): square images go
    straight to (min_size, min_size) (:40-43); otherwise min-side scale
    capped by max_size. Masks use nearest; image bilinear (PIL)."""
    img = sample["image"]
    h, w = img.shape[:2]
    if h == w:
        new_h = new_w = min_size
    else:
        size = min_size
        mx = max(h, w)
        mn = min(h, w)
        if mx / mn * size > max_size:
            size = int(round(max_size * mn / mx))
        if h < w:
            new_h, new_w = size, int(size * w / h)
        else:
            new_h, new_w = int(size * h / w), size
    if (new_h, new_w) == (h, w):
        return sample
    from PIL import Image

    out = dict(sample)
    out["image"] = np.asarray(
        Image.fromarray(img).resize((new_w, new_h), Image.BILINEAR)
    )
    sx, sy = new_w / w, new_h / h
    if "boxes" in sample:
        out["boxes"] = sample["boxes"] * np.array([sx, sy, sx, sy], np.float32)
    if "masks" in sample and sample["masks"] is not None and len(sample["masks"]):
        out["masks"] = _resize_masks_nearest(sample["masks"], new_h, new_w)
    return out


def _resize_masks_nearest(ms: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    """All-masks-at-once NEAREST resize: one numpy gather over the
    [N, H, W] stack, bit-identical to per-mask
    ``PIL.Image.resize(..., NEAREST)`` (center sampling, floor — parity
    asserted in tests/test_data_pipeline.py). The per-mask PIL loop cost
    ~67 ms/mask at 1000->1024; a 60-instance eval window spent ~4 s/image
    in it, dominating the measured loader stage (RESULTS.md round 4)."""
    h, w = ms.shape[1:3]
    # PIL's nearest kernel accumulates the source coordinate sequentially
    # (xo = 0.5*scale; xo += scale per pixel) and floors the ACCUMULATED
    # value; the direct formula floor((i+0.5)*scale) disagrees at exact
    # rounding ties (e.g. 640->1066), shifting mask rows/cols by 1px.
    # Reproduce the accumulation exactly (cumsum of the per-pixel step).
    ix = _pil_nearest_index(w, new_w)
    iy = _pil_nearest_index(h, new_h)
    return np.ascontiguousarray(ms[:, iy[:, None], ix[None, :]])


def _pil_nearest_index(old: int, new: int) -> np.ndarray:
    s = old / new
    acc = np.cumsum(np.concatenate([[0.5 * s], np.full(new - 1, s)]))
    return np.minimum(np.floor(acc).astype(np.int64), old - 1)


def hflip_sample(sample: dict) -> dict:
    img = sample["image"]
    w = img.shape[1]
    out = dict(sample)
    out["image"] = img[:, ::-1].copy()
    if "boxes" in sample:
        b = sample["boxes"].copy()
        x1 = w - sample["boxes"][:, 2] - 1
        x2 = w - sample["boxes"][:, 0] - 1
        b[:, 0], b[:, 2] = x1, x2
        out["boxes"] = b
    if "masks" in sample and sample["masks"] is not None and len(sample["masks"]):
        out["masks"] = sample["masks"][:, :, ::-1].copy()
    return out


def random_erasing(img: np.ndarray, rng: np.random.Generator, prob: float) -> np.ndarray:
    """0-10 applications of the tiny pixel-noise eraser (:146-205)."""
    img = img.copy()
    h, w, c = img.shape
    num = rng.integers(0, 11)
    for _ in range(num):
        if rng.random() > prob:
            continue
        for _ in range(100):
            s = rng.uniform(0.001, 0.004) * h * w
            r = rng.uniform(0.2, 1 / 0.2)
            ew = int(np.sqrt(s / r))
            eh = int(np.sqrt(s * r))
            left = rng.integers(0, w)
            top = rng.integers(0, h)
            if left + ew <= w and top + eh <= h:
                img[top : top + eh, left : left + ew] = rng.uniform(
                    0, 255, (eh, ew, c)
                ).astype(img.dtype)
                break
    return img


def color_jitter(img: np.ndarray, rng: np.random.Generator, brightness=0.15, contrast=0.15, hue=0.05) -> np.ndarray:
    """The source/no_label color stack (transforms/build.py:36-50)."""
    img = adjust_brightness(img, rng.uniform(1 - brightness, 1 + brightness))
    img = adjust_contrast(img, rng.uniform(1 - contrast, 1 + contrast))
    img = adjust_hue(img, rng.uniform(-hue, hue))
    return img


def normalize_bgr255(img: np.ndarray, std: np.ndarray | None = None) -> np.ndarray:
    """RGB u8 -> BGR float minus pixel mean, over PIXEL_STD
    (transforms.py:95-99; the reference default std is 1, but INPUT.
    PIXEL_STD is supported — unit-scale inputs stabilize from-scratch
    training)."""
    bgr = img[..., ::-1].astype(np.float32)
    out = bgr - PIXEL_MEAN_BGR
    if std is not None:
        out = out / np.asarray(std, np.float32)
    return out


# ------------------------------------------------------------ pipelines
def source_transform(sample: dict, rng: np.random.Generator, min_size=800, max_size=1333, erase_prob=0.7) -> dict:
    """Labeled-domain train pipeline (transforms/build.py:36-50)."""
    sample = resize_sample(sample, min_size, max_size)
    if rng.random() < 0.5:
        sample = hflip_sample(sample)
    img = color_jitter(sample["image"], rng)
    img = random_erasing(img, rng, erase_prob)
    out = dict(sample)
    out["image"] = normalize_bgr255(img)
    return out


def unlabeled_transform(sample: dict, rng: np.random.Generator, k: int, min_size=800, max_size=1333, erase_prob=0.9):
    """no_label pipeline: one shared geometric transform, then K+1
    independent color/erase versions (transforms/build.py:21-35,
    Pap.py:818-830). Returns list of K normalized image arrays."""
    sample = resize_sample(sample, min_size, max_size)
    if rng.random() < 0.5:
        sample = hflip_sample(sample)
    outs = []
    for _ in range(k):
        img = color_jitter(sample["image"], rng)
        img = random_erasing(img, rng, erase_prob)
        outs.append(normalize_bgr255(img))
    return outs


def test_transform(sample: dict, min_size=800, max_size=1333) -> dict:
    sample = resize_sample(sample, min_size, max_size)
    out = dict(sample)
    out["image"] = normalize_bgr255(sample["image"])
    return out


def tta_transform(sample: dict, rng: np.random.Generator, k: int, min_size=800, max_size=1333):
    """Test-time augmentation (TEST.TTA, transforms/build.py:65-79):
    same split as the no_label pipeline — one geometric transform, K
    color/erase views — but keeps the (resized) targets for scoring."""
    sample = resize_sample(sample, min_size, max_size)
    views = []
    for _ in range(k):
        img = color_jitter(sample["image"], rng)
        img = random_erasing(img, rng, 0.9)
        views.append(normalize_bgr255(img))
    out = dict(sample)
    out["views"] = views
    return out
