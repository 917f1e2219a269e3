"""Dataset catalog: name -> (factory, args).

Parity with the reference paths catalog (reference:
maskrcnn_benchmark/config/paths_catalog.py:7-229): the pap splits
(papnuclei_train/val/test/source/no_label) map to PapDataset /
PapUnlabeledDataset constructions rooted at DATA_DIR; synthetic_*
entries provide the self-contained fallback (the reference's own image
list is a user stub, Pap.py:40-44).
"""

from __future__ import annotations

import os


class DatasetCatalog:
    DATA_DIR = os.environ.get("MMT_PSM_DATA_DIR", "datasets")

    DATASETS = {
        "papnuclei_train": {"factory": "PapDataset", "split": "train", "is_train": True, "overlap": 0.75},
        "papnuclei_source": {"factory": "PapDataset", "split": "train", "is_train": True, "overlap": 0.75},
        "papnuclei_val": {"factory": "PapDataset", "split": "val", "is_train": False, "overlap": 0.0},
        "papnuclei_test": {"factory": "PapDataset", "split": "test", "is_train": False, "overlap": 0.0},
        "papnuclei_no_label": {"factory": "PapUnlabeledDataset", "split": "no_label"},
        "synthetic_train": {"factory": "synthetic", "is_train": True, "seed": 0},
        "synthetic_val": {"factory": "synthetic", "is_train": False, "seed": 42},
    }

    @classmethod
    def get(cls, name: str):
        if name not in cls.DATASETS:
            raise KeyError(f"unknown dataset {name!r}; known: {sorted(cls.DATASETS)}")
        attrs = dict(cls.DATASETS[name])
        factory = attrs.pop("factory")
        if factory == "synthetic":
            from .pap import synthetic_slide_dataset

            return synthetic_slide_dataset(
                seed=attrs.get("seed", 0), is_train=attrs.get("is_train", True)
            )
        if factory == "PapUnlabeledDataset":
            from .pap import PapUnlabeledDataset

            root = os.path.join(cls.DATA_DIR, "pap", attrs["split"])
            patches = sorted(
                os.path.join(root, f) for f in os.listdir(root) if f.endswith((".png", ".jpg"))
            ) if os.path.isdir(root) else []
            return PapUnlabeledDataset(patches)
        # PapDataset from an on-disk layout: images/*.png + masks/<img>/<inst>_<label>.png
        from .pap import PapDataset, SlideAnnotations
        import numpy as np
        from PIL import Image

        root = os.path.join(cls.DATA_DIR, "pap", attrs["split"])
        if not os.path.isdir(root):
            raise FileNotFoundError(
                f"{root} not found — supply real pap data or use synthetic_* datasets"
            )
        slides, anns = [], []
        img_dir = os.path.join(root, "images")
        for fname in sorted(os.listdir(img_dir)):
            slides.append(os.path.join(img_dir, fname))
            mask_dir = os.path.join(root, "masks", os.path.splitext(fname)[0])
            boxes, labels, masks = [], [], []
            if os.path.isdir(mask_dir):
                for mf in sorted(os.listdir(mask_dir)):
                    label = int(os.path.splitext(mf)[0].rsplit("_", 1)[-1])
                    m = np.asarray(Image.open(os.path.join(mask_dir, mf))) > 0
                    ys, xs = np.nonzero(m)
                    if len(ys) == 0:
                        continue
                    boxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
                    labels.append(label)
                    masks.append(m)
            anns.append(
                SlideAnnotations(
                    boxes=np.asarray(boxes, np.float32).reshape(-1, 4),
                    labels=np.asarray(labels, np.int32),
                    masks=masks,
                )
            )
        return PapDataset(
            slides, anns, overlap=attrs.get("overlap", 0.0), is_train=attrs.get("is_train", False)
        )
