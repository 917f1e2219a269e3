"""Brief CPU training of the ACTUAL torch reference on synthetic pap data.

VERDICT r3 item 1: the composed parity suite ran only at random init,
where class scores are near-uniform and the score-threshold / per-class
NMS / 200-cap paths (reference box_head/inference.py:92-145,
relation_module.py:503-601) see one narrow score regime. This module
trains the reference's own ``GeneralizedRCNN`` for a few hundred SGD
steps on the shared synthetic cell generator — enough to peak the score
distribution — and caches the state_dict so the trained-weights parity
tests (tests/test_trained_pipeline_parity.py) pay the cost once.

The reference's mask loss rasterizes GT polygons through
pycocotools.mask (segmentation_mask.py:127-137), which ref_stack stubs
empty; :func:`fill_pycoco_stub` backs the stub with this repo's PIL
rasterizer + RLE codecs (internally consistent frPyObjects/merge/decode
— training targets, not eval parity, so bit-equality with the real
pycocotools is not required).

Stability note: from random init the reference's REG_IOU relation-NMS
loss explodes (RESULTS.md round-1 note — the reference sidesteps it by
always COCO-initializing, train_mean_teacher.py:41-43); the harness
loop therefore clips gradients, which the reference's own loop never
needed because of its pretrained init.
"""

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

_filled = False


def fill_pycoco_stub():
    """Back the pycocotools.mask stub with working implementations."""
    global _filled
    if _filled:
        return
    from mmt_psm_tpu.data.coco import rasterize_polygons
    from mmt_psm_tpu.evaluation import _native

    m = sys.modules["pycocotools.mask"]

    def _encode(mask):
        return {
            "size": [int(mask.shape[0]), int(mask.shape[1])],
            "counts": [int(c) for c in _native.rle_encode(mask)],
        }

    def _decode_one(rle):
        h, w = rle["size"]
        return _native.rle_decode(np.asarray(rle["counts"], np.int64), h, w)

    def frPyObjects(pyobj, h, w):
        # list of flat polygon arrays -> list of RLEs (training targets)
        assert isinstance(pyobj, (list, tuple)), type(pyobj)
        return [
            _encode(rasterize_polygons([np.asarray(p, np.float64).tolist()], h, w))
            for p in pyobj
        ]

    def merge(rles, intersect=0):
        assert not intersect
        out = _decode_one(rles[0]).astype(bool)
        for r in rles[1:]:
            out |= _decode_one(r).astype(bool)
        return _encode(out)

    def decode(rleObjs):
        if isinstance(rleObjs, dict):
            return _decode_one(rleObjs)
        return np.stack([_decode_one(r) for r in rleObjs], axis=-1)

    m.frPyObjects = frPyObjects
    m.merge = merge
    m.decode = decode
    _filled = True


def make_targets(ref, sample, device="cpu"):
    """SyntheticSample -> reference BoxList target (labels + polygon
    SegmentationMask), the shape the train path consumes
    (rpn/loss.py:138, box_head/loss.py:82, mask_head/loss.py:136)."""
    import torch

    from maskrcnn_benchmark.structures.segmentation_mask import SegmentationMask
    from mmt_psm_tpu.utils.segms import mask_to_polygons

    h, w = int(sample.image_size[0]), int(sample.image_size[1])
    keep_boxes, keep_labels, polys = [], [], []
    for i in range(len(sample.valid)):
        if not sample.valid[i]:
            continue
        p = mask_to_polygons(sample.masks[i])
        if not p:
            continue
        keep_boxes.append(sample.boxes[i])
        keep_labels.append(int(sample.labels[i]))
        polys.append(p)
    target = ref.BoxList(torch.as_tensor(np.asarray(keep_boxes, np.float32)), (w, h), mode="xyxy")
    target.add_field("labels", torch.as_tensor(keep_labels, dtype=torch.int64))
    target.add_field("masks", SegmentationMask(polys, (w, h)))
    return target


def synth_torch_batch(ref, rng, batch_size, size, num_cells=(3, 8), radius_range=(0.08, 0.18)):
    """Normalized CHW image tensors + targets from the shared generator
    (BGR255 - mean, the reference transform — defaults.py:48-52)."""
    import torch

    from mmt_psm_tpu.data.synthetic import generate_sample, normalize_image

    images, targets = [], []
    for _ in range(batch_size):
        s = generate_sample(
            rng, image_size=size, max_instances=64, num_cells=num_cells,
            radius_range=radius_range,
        )
        img = normalize_image(s.image)  # [H, W, 3] BGR
        images.append(torch.as_tensor(np.transpose(img, (2, 0, 1))))
        targets.append(make_targets(ref, s))
    return images, targets


# ~40 s/iter averaged on a 1-core host. The (768, jumbo-radius) arm is
# what teaches the model the >=448px sqrt(area) instances that the
# trained-parity canvases use to reach FPN level-mapper levels 4-5
# (poolers.py:11-42) — the first recipe trained only at (256, 512) with
# default radii and produced ZERO detections above sqrt(area) 100 on
# the 1024 canvas (scale-OOD), with scores capped at ~0.53.
TRAIN_RECIPE_V2 = dict(
    iters=135,
    batch=2,
    lr=2e-3,
    clip=5.0,
    seed=7,
    sizes=(256, 512, 768),
    cells=((3, 8), (3, 8), (2, 5)),
    radii=((0.08, 0.18), (0.08, 0.18), (0.10, 0.35)),
)

# v3 continues from the cached v2 state (``base``): +100 iters weighted
# toward the 512/768 scales — v2's composed-canvas score ceiling was
# smax ~0.53, short of the peaked regime the score-threshold/NMS paths
# ship in
TRAIN_RECIPE = dict(
    iters=100,
    batch=2,
    lr=2e-3,
    clip=5.0,
    seed=8,
    sizes=(512, 768),
    cells=((3, 8), (2, 5)),
    radii=((0.08, 0.18), (0.10, 0.35)),
    base=tuple(sorted(TRAIN_RECIPE_V2.items())),
)


# Cache in the repo (survives host /tmp wipes between rounds); override
# with MMT_REF_TRAIN_CACHE.
DEFAULT_CACHE_DIR = os.environ.get(
    "MMT_REF_TRAIN_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache"),
)


def trained_reference_sd(ref, cfg, cache_dir=None, recipe=TRAIN_RECIPE, log=print):
    """Train the reference briefly on CPU; returns a state_dict.

    Cached on disk keyed by the recipe + config yaml, so repeated test
    runs (and the paired JAX-side forward) pay the ~CPU-train cost once.
    """
    import torch

    fill_pycoco_stub()
    if cache_dir is None:
        cache_dir = DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    key = hashlib.sha1(repr(sorted(recipe.items())).encode()).hexdigest()[:10]
    path = os.path.join(cache_dir, f"ref_trained_{key}.pth")
    if os.path.exists(path):
        return torch.load(path, map_location="cpu", weights_only=False)

    torch.manual_seed(recipe["seed"])
    model = ref.GeneralizedRCNN(cfg)
    if recipe.get("base"):
        # continuation: start from the cached base-recipe state
        model.load_state_dict(trained_reference_sd(ref, cfg, cache_dir, dict(recipe["base"]), log))
    model.train()
    opt = torch.optim.SGD(model.parameters(), lr=recipe["lr"], momentum=0.9, weight_decay=5e-4)
    rng = np.random.default_rng(recipe["seed"])
    sizes = recipe["sizes"]
    cells = recipe.get("cells", tuple((3, 8) for _ in sizes))
    radii = recipe.get("radii", tuple((0.08, 0.18) for _ in sizes))
    for it in range(recipe["iters"]):
        k = it % len(sizes)
        size = sizes[k]
        images, targets = synth_torch_batch(
            ref, rng, recipe["batch"], size, num_cells=cells[k], radius_range=radii[k]
        )
        il = ref.to_image_list(images, 32)
        losses = model(il, targets)
        total = sum(losses.values())
        total_v = float(total.detach())
        if not torch.isfinite(total):
            raise RuntimeError(f"non-finite loss at iter {it}: {losses}")
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), recipe["clip"])
        opt.step()
        if it % 20 == 0:
            log(
                f"[ref-train] it {it} size {size} total {total_v:.3f} "
                + " ".join(f"{k}={float(v.detach()):.3f}" for k, v in losses.items())
            )
    sd = model.state_dict()
    torch.save(sd, path)
    return sd
