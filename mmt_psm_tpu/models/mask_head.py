"""RoI mask head: extractor, predictor, targets, loss, inference.

Parity targets in the reference:
* MaskRCNNFPNFeatureExtractor — 14x14 pooler + 4x conv256 ("mask_fcn1..4"),
  returns (features, pooled) (reference: maskrcnn_benchmark/modeling/
  roi_heads/mask_head/roi_mask_feature_extractors.py:91-146).
* MaskRCNNC4Predictor — 2x2/2 deconv ("conv5_mask") + 1x1 logits
  (roi_mask_predictors.py:9-36).
* Loss — per-positive-RoI binary cross entropy on the gt-class channel
  against the gt mask projected into the RoI at 28x28
  (mask_head/loss.py:78-180).
* Train runs on positive RoIs only (mask_head/mask_head.py:15-36).

Target projection: the reference rasterizes cropped polygons per RoI on
the CPU (mask_head/loss.py:37-75). TPU redesign: ground-truth instance
masks arrive as full-image bitmasks and are crop-resized on device with
the same ROIAlign machinery, then thresholded at 0.5 — the Detectron2
"bitmask" equivalent; numerically near-identical for blob-like cells.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import losses as L
from ..ops.roi_align import roi_align
from .box_head import SampledRoIs, pool_boxes_batched


class MaskRCNNFPNExtractor(nn.Module):
    layers: tuple = (256, 256, 256, 256)
    dtype: object = None

    @nn.compact
    def __call__(self, pooled):
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")  # kaiming_normal
        x = pooled
        for i, ch in enumerate(self.layers):
            x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=init, dtype=self.dtype, name=f"mask_fcn{i+1}")(x)
            x = nn.relu(x)
        return x


class PRCNNExtractor(nn.Module):
    """CSPN-baseline second-stage extractor (reference
    roi_mask_feature_extractors.py:9-88 PRCNNFeatureExtractor): its own
    8-conv tower over the RAW normalized image with RoI-align pooling at
    four image scales (1, 1/2, 1/4, 1/8) into 25x25 bins, fused by
    posconv1 (480->256, relu) and posconv2 (256->32, linear).

    Per-image: image [H, W, 3] + boxes [S, 4] -> [S, 25, 25, 32].
    Wrap with nn.vmap for a batch (shared params)."""

    pool_size: int = 25
    sampling: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, image, boxes):
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

        def conv(x, ch, name):
            return nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=init, dtype=self.dtype, name=name)(x)

        def down(x):
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        x = image.astype(self.dtype or jnp.float32)
        pooled = []
        channels = ((32, 32), (64, 64), (128, 128), (256, 256))
        for stage, (c1, c2) in enumerate(channels):
            x = nn.relu(conv(x, c1, f"conv{2*stage+1}"))
            x = nn.relu(conv(x, c2, f"conv{2*stage+2}"))
            scale = 0.5**stage
            pooled.append(
                roi_align(x.astype(jnp.float32), boxes, scale, self.pool_size, self.sampling)
            )
            if stage < 3:
                x = down(x)
        cat = jnp.concatenate(pooled, axis=-1)  # [S, 25, 25, 480]
        cat = nn.relu(conv(cat.astype(self.dtype or jnp.float32), 256, "posconv1"))
        return conv(cat, 32, "posconv2")


class PRCNNPredictor(nn.Module):
    """relu + 1x1 logits (roi_mask_predictors.py:39-53)."""

    num_classes: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        return nn.Conv(
            self.num_classes, (1, 1), kernel_init=init, dtype=self.dtype, name="mask_fcn_logits"
        )(nn.relu(x))


class MaskRCNNC4Predictor(nn.Module):
    num_classes: int = 3
    dim_reduced: int = 256
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        x = nn.ConvTranspose(self.dim_reduced, (2, 2), strides=(2, 2), kernel_init=init, dtype=self.dtype, name="conv5_mask")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (1, 1), kernel_init=init, dtype=self.dtype, name="mask_fcn_logits")(x)
        return x  # [N, 2P, 2P, C]


def select_positive_rois(rois: SampledRoIs, max_pos: int):
    """Compact positive RoIs to fixed ``max_pos`` slots per image
    (mask_head/mask_head.py:15-36)."""
    max_pos = min(max_pos, rois.boxes.shape[1])  # can't exceed the RoI batch

    def per_image(boxes, labels, is_pos, matched_gt):
        score = is_pos.astype(jnp.float32)
        _, idx = jax.lax.top_k(score, max_pos)  # stable: first positives first
        v = is_pos[idx]
        return boxes[idx], jnp.where(v, labels[idx], 0), matched_gt[idx], v

    return jax.vmap(per_image)(rois.boxes, rois.labels, rois.is_pos, rois.matched_gt)


def crop_masks_to_boxes(gt_masks, boxes, resolution: int):
    """Project full-image instance masks into RoIs at RxR, bilinear + 0.5.

    gt_masks: [S, H, W] (already gathered per-RoI); boxes: [S, 4].
    """
    m = gt_masks[..., None].astype(jnp.float32)  # [S, H, W, 1]

    def one(mask, box):
        out = roi_align(mask, box[None], 1.0, resolution, 2)  # [1, R, R, 1]
        return out[0, :, :, 0]

    vals = jax.vmap(one)(m, boxes)
    return (vals >= 0.5).astype(jnp.float32)


def mask_head_loss(mask_logits, mask_targets, labels, valid):
    """BCE on the gt-class channel over positives (mask_head/loss.py:151-180).

    mask_logits: [B, S, R, R, C]; mask_targets: [B, S, R, R];
    labels: [B, S]; valid: [B, S] positive mask.
    """
    c = mask_logits.shape[-1]
    lab = jnp.maximum(labels, 0)
    sel = jnp.take_along_axis(
        mask_logits.astype(jnp.float32),
        lab[:, :, None, None, None],
        axis=-1,
    )[..., 0]  # [B, S, R, R]
    w = valid.astype(jnp.float32)[:, :, None, None]
    # reference: mean BCE over all positive-RoI pixels
    per_pix = (
        jnp.maximum(sel, 0) - sel * mask_targets + jnp.log1p(jnp.exp(-jnp.abs(sel)))
    )
    denom = jnp.maximum(jnp.sum(w) * sel.shape[-1] * sel.shape[-2], 1.0)
    return jnp.sum(per_pix * w) / denom


def select_mask_probs(mask_logits, labels):
    """Per-detection sigmoid mask for its predicted label
    (mask_head/inference.py:29-65). mask_logits: [B, K, R, R, C]."""
    lab = jnp.maximum(labels, 0)
    sel = jnp.take_along_axis(
        mask_logits.astype(jnp.float32), lab[:, :, None, None, None], axis=-1
    )[..., 0]
    return jax.nn.sigmoid(sel)  # [B, K, R, R]
