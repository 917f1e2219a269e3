import numpy as np

from mmt_psm_tpu.data import transforms as T
from mmt_psm_tpu.data.loader import make_source_loader, make_test_loader, make_unlabeled_loader, pad_to_canvas
from mmt_psm_tpu.data.pap import (
    PapUnlabeledDataset,
    crop_window_gt,
    generate_windows,
    SlideAnnotations,
    synthetic_slide_dataset,
)


def test_generate_windows_cover_and_overlap():
    ws = generate_windows(1000, 1000, 1000, 0.75)
    assert ws == [(0, 0)]
    ws = generate_windows(2000, 1500, 1000, 0.75)
    xs = sorted({x for x, y in ws})
    ys = sorted({y for x, y in ws})
    assert xs[0] == 0 and xs[-1] == 500  # clamped last window
    assert ys[0] == 0 and ys[-1] == 1000
    assert xs[1] == 250  # step = win * (1 - overlap)
    # eval mode: no overlap
    ws0 = generate_windows(2000, 2000, 1000, 0.0)
    assert ws0 == [(0, 0), (1000, 0), (0, 1000), (1000, 1000)]


def test_crop_window_gt_filters_tiny_remnants():
    m1 = np.zeros((200, 200), bool)
    m1[40:80, 40:80] = True  # fully inside window (0,0,100)
    m2 = np.zeros((200, 200), bool)
    m2[90:190, 90:190] = True  # only a sliver inside
    ann = SlideAnnotations(
        boxes=np.array([[40, 40, 79, 79], [90, 90, 189, 189]], np.float32),
        labels=np.array([1, 2], np.int32),
        masks=[m1, m2],
    )
    boxes, labels, masks = crop_window_gt(ann, 0, 0, 100)
    assert len(labels) == 2  # sliver is 100/10000 = 1% > 0.5% cutoff
    boxes, labels, masks = crop_window_gt(ann, 0, 0, 95)
    # now the sliver is 25/10000 < 0.005 -> dropped
    assert list(labels) == [1]


def _crop_window_gt_naive(ann, x, y, win, area_ratio_cutoff=0.005):
    """The original full-frame-scan formulation, kept as the oracle for
    the support-box-cached crop_window_gt."""
    boxes, labels, masks = [], [], []
    for i in range(len(ann.labels)):
        bx = ann.boxes[i]
        if bx[2] < x or bx[0] >= x + win or bx[3] < y or bx[1] >= y + win:
            continue
        m = ann.masks[i]
        full_area = int(np.count_nonzero(m))
        local = m[y : y + win, x : x + win]
        if local.shape != (win, win):
            pad = np.zeros((win, win), bool)
            pad[: local.shape[0], : local.shape[1]] = local
            local = pad
        area = int(np.count_nonzero(local))
        if full_area == 0 or area / full_area < area_ratio_cutoff or area < 4:
            continue
        ys, xs = np.nonzero(local)
        boxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
        labels.append(int(ann.labels[i]))
        masks.append(np.asarray(local, bool))
    if not boxes:
        return np.zeros((0, 4), np.float32), np.zeros((0,), np.int32), []
    return np.asarray(boxes, np.float32), np.asarray(labels, np.int32), masks


def test_crop_window_gt_matches_naive_full_frame_scan():
    """The support-box-cached crop (one geometry pass per slide, then
    instance-sized scans per window) must be bit-identical to slicing
    the full frame per window: boxes, labels, masks, and the
    ratio/area drop decisions, including edge-clamped windows, empty
    masks, and instances whose box overlaps the window but whose mask
    support does not."""
    rng = np.random.default_rng(7)
    H = W = 300
    masks, boxes, labels = [], [], []
    yy, xx = np.ogrid[:H, :W]
    for k in range(25):
        cy, cx = rng.integers(10, 290, 2)
        r = int(rng.integers(4, 60))
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        masks.append(m)
        ys, xs = np.nonzero(m)
        if len(ys):
            boxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
        else:
            boxes.append([cx, cy, cx, cy])
        labels.append(1 + k % 2)
    # an all-empty mask whose box still overlaps windows
    masks.append(np.zeros((H, W), bool))
    boxes.append([50, 50, 120, 120])
    labels.append(1)
    # a box LARGER than the mask support (mask misses some windows the
    # box overlaps)
    m = np.zeros((H, W), bool)
    m[10:20, 10:20] = True
    masks.append(m)
    boxes.append([0, 0, 299, 299])
    labels.append(2)
    ann = SlideAnnotations(
        boxes=np.asarray(boxes, np.float32),
        labels=np.asarray(labels, np.int32),
        masks=masks,
    )
    from mmt_psm_tpu.data.pap import crop_window_gt as fast

    for (x, y, win) in [(0, 0, 100), (100, 100, 100), (250, 250, 100), (0, 0, 300), (37, 81, 150)]:
        fb, fl, fm = fast(ann, x, y, win)
        nb, nl, nm = _crop_window_gt_naive(ann, x, y, win)
        np.testing.assert_array_equal(fb, nb)
        np.testing.assert_array_equal(fl, nl)
        assert len(fm) == len(nm)
        for a, b in zip(fm, nm):
            np.testing.assert_array_equal(np.asarray(a, bool), np.asarray(b, bool))


def test_resize_square_fast_path_and_boxes():
    img = np.zeros((100, 100, 3), np.uint8)
    s = {"image": img, "boxes": np.array([[10, 20, 30, 40]], np.float32), "labels": np.array([1]), "masks": np.zeros((1, 100, 100), np.uint8)}
    out = T.resize_sample(s, 80, 1333)
    assert out["image"].shape == (80, 80, 3)
    np.testing.assert_allclose(out["boxes"], [[8, 16, 24, 32]])


def test_vectorized_mask_resize_matches_pil_nearest():
    """_resize_masks_nearest (one gather over the [N, H, W] stack) must be
    bit-identical to the per-mask PIL NEAREST resize it replaced — the
    reference resizes masks through torchvision/PIL (reference
    maskrcnn_benchmark/data/transforms/transforms.py:66-71), so parity
    here keeps the composed parity suites meaningful."""
    from PIL import Image

    rng = np.random.default_rng(3)
    for (h, w, nh, nw) in [
        (1000, 1000, 1024, 1024),  # the eval flagship shape
        (100, 100, 80, 80),        # downscale
        (7, 13, 19, 5),            # odd up/down mix
        (33, 17, 17, 33),
        (251, 97, 300, 309),
        # Tie-inducing shapes where floor((i+0.5)*scale) disagrees with
        # PIL's sequential accumulation (ADVICE r4): exact rounding ties.
        (480, 640, 800, 1066),
        (600, 800, 800, 1066),
        (720, 1280, 750, 1333),
        (999, 1000, 1000, 1001),
        (4, 7, 7, 4),
        (1280, 640, 1333, 1066),
    ]:
        ms = rng.integers(0, 2, (5, h, w)).astype(np.uint8)
        ref = np.stack(
            [np.asarray(Image.fromarray(m).resize((nw, nh), Image.NEAREST)) for m in ms]
        )
        got = T._resize_masks_nearest(ms, nh, nw)
        np.testing.assert_array_equal(ref, got)
        assert got.flags["C_CONTIGUOUS"]
    # Randomized sweep over small shapes — catches any remaining
    # accumulation/rounding divergence from the PIL kernel.
    for _ in range(200):
        h, w = rng.integers(2, 64, 2)
        nh, nw = rng.integers(2, 96, 2)
        m = rng.integers(0, 2, (1, h, w)).astype(np.uint8)
        ref = np.asarray(Image.fromarray(m[0]).resize((int(nw), int(nh)), Image.NEAREST))
        got = T._resize_masks_nearest(m, int(nh), int(nw))[0]
        np.testing.assert_array_equal(ref, got, err_msg=f"{h}x{w}->{nh}x{nw}")


def test_hflip_involution():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    s = {"image": img, "boxes": np.array([[5, 5, 20, 20]], np.float32), "labels": np.array([1]), "masks": rng.integers(0, 2, (1, 40, 60)).astype(np.uint8)}
    out = T.hflip_sample(T.hflip_sample(s))
    np.testing.assert_array_equal(out["image"], img)
    np.testing.assert_allclose(out["boxes"], s["boxes"])
    np.testing.assert_array_equal(out["masks"], s["masks"])


def test_color_ops_ranges():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    for fn, arg in [
        (T.adjust_brightness, 1.15),
        (T.adjust_contrast, 0.85),
        (T.adjust_hue, 0.05),
        (T.adjust_saturation, 1.2),
        (T.adjust_gamma, 1.1),
    ]:
        out = fn(img, arg)
        assert out.dtype == np.uint8 and out.shape == img.shape
    # hue shift by 0 is identity (up to rounding)
    np.testing.assert_allclose(T.adjust_hue(img, 0.0), img, atol=2)


def test_source_loader_shapes():
    ds = synthetic_slide_dataset(seed=0, num_slides=1, slide_size=256, win_size=128, overlap=0.5)
    assert len(ds) > 0
    loader = make_source_loader(ds, batch_size=2, canvas=128, max_gt=32, min_size=128, num_iterations=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (2, 128, 128, 3)
    assert b["boxes"].shape == (2, 32, 4)
    assert b["masks"].shape == (2, 32, 128, 128)
    assert b["gt_valid"].any()
    # masks only where valid
    assert (b["masks"][~b["gt_valid"]] == 0).all()


def test_unlabeled_loader_kaug():
    rng = np.random.default_rng(2)
    patches = [rng.integers(0, 255, (100, 100, 3)).astype(np.uint8) for _ in range(4)]
    ds = PapUnlabeledDataset(patches)
    loader = make_unlabeled_loader(ds, batch_size=2, canvas=96, aug_k=2, aug_s=1, min_size=96)
    b = next(iter(loader))
    assert b["t_images"].shape == (2, 2, 96, 96, 3)
    assert b["s_images"].shape == (2, 1, 96, 96, 3)
    # views differ (color jitter) but share geometry
    assert np.abs(b["t_images"][0, 0] - b["t_images"][0, 1]).max() > 0


def test_test_loader_partial_batch():
    ds = synthetic_slide_dataset(seed=1, num_slides=1, slide_size=256, win_size=128, overlap=0.0, is_train=False)
    loader = make_test_loader(ds, batch_size=3, canvas=128, min_size=128)
    batches = list(loader)
    total = sum(b["n_real"] for b in batches)
    assert total == len(ds)
    for b in batches:
        assert b["image"].shape[0] == 3


def test_tta_loader_shapes():
    """TTA batches: K padded color views + standard eval keys
    (reference TTABatchCollator, data/build.py:301-302)."""
    from mmt_psm_tpu.data.loader import make_tta_loader
    from mmt_psm_tpu.data.pap import synthetic_slide_dataset

    ds = synthetic_slide_dataset(seed=1, num_slides=1, slide_size=128, win_size=128, is_train=False)
    loader = make_tta_loader(ds, batch_size=1, canvas=128, tta_k=3, max_gt=8, min_size=128, max_size=128)
    batch = next(loader)
    assert batch["tta_views"].shape == (1, 3, 128, 128, 3)
    assert batch["image"].shape == (1, 128, 128, 3)
    assert batch["n_real"] == 1
    import numpy as np

    np.testing.assert_allclose(batch["tta_views"][0, 0], batch["image"][0])


def test_raw_u8_device_normalize_parity():
    """make_test_loader(raw_u8=True) ships RGB u8 canvases and the
    jitted infer normalizes on device (engine/inference.py) — must be
    numerically identical to the host-normalized f32 pipeline (same
    BGR-flip + mean-subtract arithmetic, 4x fewer transfer bytes)."""
    import jax
    import numpy as np

    from mmt_psm_tpu.data.loader import make_test_loader
    from mmt_psm_tpu.data.pap import synthetic_slide_dataset
    from mmt_psm_tpu.engine.inference import _cached_infer
    from mmt_psm_tpu.models import MaskRCNN
    from test_detector import TINY

    ds = synthetic_slide_dataset(seed=5, num_slides=1, slide_size=256, win_size=128, is_train=False)
    bf = next(make_test_loader(ds, 2, 128, max_gt=8, min_size=128, max_size=128))
    bu = next(make_test_loader(ds, 2, 128, max_gt=8, min_size=128, max_size=128, raw_u8=True))
    assert bu["image"].dtype == np.uint8 and bf["image"].dtype == np.float32

    model = MaskRCNN(config=TINY)
    import jax.numpy as jnp

    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.asarray(bf["image"][:1]), jnp.asarray(bf["image_size"][:1]),
            train=False,
        )
    )()
    infer = _cached_infer(model)
    out_f = infer(params, jnp.asarray(bf["image"]), jnp.asarray(bf["image_size"]))
    out_u = infer(params, jnp.asarray(bu["image"]), jnp.asarray(bu["image_size"]))
    for a, b in zip(out_f, out_u):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-5)

    # PADDED canvas (96px windows on the 128 canvas): the f32 path
    # normalizes BEFORE zero-padding (pad pixels 0), so the device
    # normalize must zero the pad frame too — a bare mean-subtract
    # leaves it at -PIXEL_MEAN and shifts features near the border
    bf = next(make_test_loader(ds, 2, 128, max_gt=8, min_size=96, max_size=96))
    bu = next(make_test_loader(ds, 2, 128, max_gt=8, min_size=96, max_size=96, raw_u8=True))
    assert tuple(bf["image_size"][0]) == (96, 96)  # real pad stripes
    out_f = infer(params, jnp.asarray(bf["image"]), jnp.asarray(bf["image_size"]))
    out_u = infer(params, jnp.asarray(bu["image"]), jnp.asarray(bu["image_size"]))
    for a, b in zip(out_f, out_u):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-5)
