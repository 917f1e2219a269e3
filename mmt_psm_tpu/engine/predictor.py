"""Single-image demo predictor.

API parity with the reference COCODemo (reference:
demo/predictor.py:13-358): take a raw BGR/RGB uint8 image, resize +
normalize, run the jitted model, map detections back to original
coordinates, paste masks, and optionally render overlays.
"""

from __future__ import annotations


import jax
import numpy as np

from ..data import transforms as T
from ..engine.inference import detections_to_instseg

CATEGORIES = ["__background", "cytoplasm", "nuclei"]  # Pap.py:107-111


class CellDemo:
    def __init__(self, model, params, canvas: int | None = None, min_size: int = 800, max_size: int = 1333, confidence_threshold: float = 0.5):
        self.model = model
        self.params = params
        self.canvas = canvas or model.config.image_size
        self.min_size = min_size
        self.max_size = max_size
        self.confidence_threshold = confidence_threshold
        self._infer = jax.jit(self._infer_impl)

    def _infer_impl(self, params, image, size):
        d = self.model.apply(params, image, size, train=False)
        return d.boxes, d.scores, d.labels, d.valid, d.masks

    def compute_prediction(self, image_rgb: np.ndarray):
        """image_rgb: u8 [H, W, 3]. Returns dict with boxes/scores/labels
        (original-image coords) and per-class InstSeg masks."""
        h0, w0 = image_rgb.shape[:2]
        sample = T.test_transform({"image": image_rgb}, self.min_size, self.max_size)
        img = sample["image"]
        h, w = img.shape[:2]
        assert h <= self.canvas and w <= self.canvas, "canvas too small for resized image"
        padded = np.zeros((1, self.canvas, self.canvas, 3), np.float32)
        padded[0, :h, :w] = img
        size = np.asarray([[h, w]], np.int32)

        boxes, scores, labels, valid, masks = jax.tree_util.tree_map(
            np.asarray, self._infer(self.params, padded, size)
        )
        keep = valid[0] & (scores[0] >= self.confidence_threshold)
        # resize boxes back to the original image (predictor.py:208-219)
        sx, sy = w0 / w, h0 / h
        out_boxes = boxes[0][keep] * np.array([sx, sy, sx, sy], np.float32)
        out_scores = scores[0][keep]
        out_labels = labels[0][keep]

        inst = detections_to_instseg(
            out_boxes, out_scores, out_labels, np.ones(keep.sum(), bool), masks[0][keep], (h0, w0)
        )
        return {
            "boxes": out_boxes,
            "scores": out_scores,
            "labels": out_labels,
            "label_names": [CATEGORIES[int(l)] for l in out_labels],
            "masks": inst,
        }

    def run_on_image(self, image_rgb: np.ndarray) -> np.ndarray:
        """Full demo path: predict + overlay (run_on_opencv_image
        equivalent, predictor.py:161-182)."""
        pred = self.compute_prediction(image_rgb)
        from ..utils.visual import overlay_instances

        return overlay_instances(image_rgb, pred)
