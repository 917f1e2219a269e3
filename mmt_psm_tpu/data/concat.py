"""Dataset composition: concatenation and plain file lists.

Equivalents of the reference's dataset combinators (reference:
maskrcnn_benchmark/data/datasets/concat_dataset.py:1-23,
list_dataset.py:1-36; build_dataset concatenates the per-name datasets
for training — data/build.py:60-66). Torch-free: a "dataset" here is
anything with ``__len__`` and ``__getitem__`` returning the shared
sample dict {image, boxes, labels, masks}.
"""

from __future__ import annotations

import bisect
from typing import Sequence

import numpy as np


class ConcatDataset:
    """Concatenation of several datasets (reference concat_dataset.py,
    itself a thin wrapper over torch's ConcatDataset with
    get_idxs/get_img_info passthrough)."""

    def __init__(self, datasets: Sequence):
        assert len(datasets) > 0
        self.datasets = list(datasets)
        self.cumulative_sizes = list(np.cumsum([len(d) for d in self.datasets]))

    def __len__(self):
        return self.cumulative_sizes[-1]

    def get_idxs(self, idx: int):
        dataset_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        sample_idx = idx if dataset_idx == 0 else idx - self.cumulative_sizes[dataset_idx - 1]
        return dataset_idx, sample_idx

    def __getitem__(self, idx: int):
        dataset_idx, sample_idx = self.get_idxs(idx)
        return self.datasets[dataset_idx][sample_idx]

    def get_img_info(self, idx: int):
        dataset_idx, sample_idx = self.get_idxs(idx)
        return self.datasets[dataset_idx].get_img_info(sample_idx)


class ListDataset:
    """Images from an explicit path list with optional per-image
    annotations (reference list_dataset.py: image paths + BoxList
    targets). ``annotations[i]`` is None or a dict with boxes [M,4]
    xyxy, labels [M], masks [M,H,W]."""

    def __init__(self, image_paths: Sequence[str], annotations: Sequence[dict] | None = None):
        self.image_paths = list(image_paths)
        self.annotations = list(annotations) if annotations is not None else [None] * len(self.image_paths)
        assert len(self.image_paths) == len(self.annotations)

    def __len__(self):
        return len(self.image_paths)

    def get_img_info(self, idx: int):
        from PIL import Image

        with Image.open(self.image_paths[idx]) as im:
            return {"height": im.height, "width": im.width, "file_name": self.image_paths[idx]}

    def __getitem__(self, idx: int) -> dict:
        from PIL import Image

        image = np.asarray(Image.open(self.image_paths[idx]).convert("RGB"))
        ann = self.annotations[idx]
        h, w = image.shape[:2]
        if ann is None:
            return {
                "image": image,
                "boxes": np.zeros((0, 4), np.float32),
                "labels": np.zeros((0,), np.int32),
                "masks": np.zeros((0, h, w), np.uint8),
            }
        return {
            "image": image,
            "boxes": np.asarray(ann["boxes"], np.float32).reshape(-1, 4),
            "labels": np.asarray(ann["labels"], np.int32),
            "masks": np.asarray(ann["masks"], np.uint8).reshape(-1, h, w),
        }
