"""IR-Net mask relation refinement (CIAM / CAM).

Fixed-shape port of the reference MaskRelationRefineNet (reference:
maskrcnn_benchmark/modeling/relation/mask_relation_module.py:16-247):

* each instance's own-class 28x28 mask logit is sigmoided, max-pooled to
  14x14 and concatenated with its 256-ch RoI feature (257 channels),
  then passed through the RoiAlignMaskFeatureExtractor conv stack to
  EXTRACTOR_CHANNEL maps (relation_mask_feature_extractor.py:10-49);
* CIAM: cross-instance channel attention within a class — per-channel
  instance-instance Gram matrix, (max - e) rescale, channel mean,
  softmax, gamma-gated residual (mask_relation_module.py:190-242);
  CAM: per-instance channel attention (:157-188);
* refined features go through a 2x2 deconv + 1x1 classifier back to
  per-class 28x28 logits (SAME_PREDICTOR=False path, :49-51, :102-104).

The reference splits instances per class with dynamic shapes
(prepare_msk_relation :109-155); since the attention has no rank/order
dependence, the TPU version keeps all S instances and masks the
attention to same-class valid pairs — numerically identical,
shape-static, and one kernel instead of a python loop.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MaskRelationConfig:
    type: str = "CIAM"  # or "CAM"
    extractor_channel: int = 16
    deep_super: bool = True
    norm: int = -1
    pre_norm: bool = False
    num_classes: int = 3
    # feature extractor variant (relation_mask_feature_extractor.py:140-152):
    # RoiAlignMaskFeatureExtractor / SameSizeRoiAlignMaskFeatureExtractor
    # (RoI+mask concat conv stack), DeepFeatureExtractor (RoI only),
    # MaskFeatureExtractor (own-class mask only), SameFeatureMask (RoI
    # passthrough)
    extractor: str = "RoiAlignMaskFeatureExtractor"
    # route refined features through the shared mask predictor instead of
    # the refine net's own deconv+classifier (SAME_PREDICTOR,
    # mask_relation_module.py:46-51, 97-107)
    same_predictor: bool = False
    # conv-stack compute dtype; the attention core always runs f32
    # (softmax over instance Gram energies). f32 default keeps direct
    # module-level golden tests bit-comparable to the torch reference.
    compute_dtype: str = "float32"

    @classmethod
    def from_cfg(cls, cfg):
        r = cfg.MODEL.RELATION_MASK
        return cls(
            type=r.TYPE,
            extractor_channel=r.EXTRACTOR_CHANNEL,
            deep_super=r.DEEP_SUPER,
            norm=r.NORM,
            pre_norm=r.PRE_NORM,
            num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            extractor=r.FEATURE_EXTRACTOR,
            same_predictor=r.SAME_PREDICTOR,
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
        )


def _ciam_attention(x, labels, valid, gamma, norm: int, pre_norm: bool):
    """Cross-instance channel attention, class-block masked.

    x: [S, H, W, C]; labels/valid: [S]. Same math as CIAM_Module
    (:199-242) per class block.
    """
    s = x.shape[0]
    xf = x.astype(jnp.float32)
    if pre_norm:
        nrm = jnp.sqrt(jnp.sum(xf.reshape(s, -1) ** 2, axis=-1))
        cw = xf / jnp.maximum(nrm[:, None, None, None], 1e-10)
    else:
        cw = xf
    # per-channel instance Gram matrix [C, S, S]
    energy = jnp.einsum("ihwc,jhwc->cij", cw, cw)
    same = (labels[:, None] == labels[None, :]) & valid[:, None] & valid[None, :]

    if norm == 1:
        weight = jnp.abs(jnp.sum(energy.reshape(energy.shape[0], -1), axis=1))
        weight = weight / jnp.maximum(jnp.max(weight), 1e-10)
        energy = energy * weight[:, None, None]
    # (reference norm==2 path normalizes the energy tensor; norm==-1: none)

    neg = -1e30
    masked_e = jnp.where(same[None, :, :], energy, neg)
    row_max = jnp.max(masked_e, axis=-1, keepdims=True)  # [C, S, 1]
    rescaled = jnp.where(same[None, :, :], row_max - energy, neg)
    mean_e = jnp.where(
        same, jnp.mean(jnp.where(same[None, :, :], rescaled, 0.0), axis=0), neg
    )  # [S, S]
    attention = jax.nn.softmax(mean_e, axis=-1)
    attention = jnp.where(valid[:, None], attention, 0.0)

    flat = xf.reshape(s, -1)
    out = (attention @ flat).reshape(x.shape)
    return (gamma * out + xf).astype(x.dtype)


def _cam_attention(x, gamma):
    """Per-instance channel attention (CAM_Module :157-188)."""
    s, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    q = xf.reshape(s, h * w, c).transpose(0, 2, 1)  # [S, C, HW]
    energy = jnp.einsum("scp,sdp->scd", q, q)
    energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
    attention = jax.nn.softmax(energy_new, axis=-1)
    out = jnp.einsum("scd,sdp->scp", attention, q).transpose(0, 2, 1).reshape(x.shape)
    return (gamma * out + xf).astype(x.dtype)


class ShapeBuffer(nn.Module):
    """Learnable per-class mask shape centers
    (relation_mask_feature_extractor.py:156-169): a
    [2*CENTER_PER_CLASS, R, R, 1] parameter bank, xavier-initialized;
    retained for API parity with the TRAIN_CENTER_ONLY experiments."""

    center_per_class: int = 8
    resolution: int = 28

    @nn.compact
    def __call__(self):
        return self.param(
            "center",
            nn.initializers.xavier_normal(),
            (2 * self.center_per_class, self.resolution, self.resolution, 1),
        )


class MaskRelationRefineNet(nn.Module):
    config: MaskRelationConfig

    @nn.compact
    def __call__(self, roi_feats, mask_logits, labels, valid):
        """roi_feats: [S, P, P, 256] mask-head extractor features;
        mask_logits: [S, 2P, 2P, C] first-pass logits; labels: [S] (>=1
        for real instances); valid: [S].

        Returns refined [S, 2P, 2P, C] logits (rows for invalid
        instances keep the first-pass logits).
        """
        c = self.config
        dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        lab = jnp.maximum(labels, 0)
        own = jnp.take_along_axis(mask_logits, lab[:, None, None, None], axis=-1)[..., 0]
        m = jax.nn.sigmoid(own.astype(jnp.float32))[..., None]  # [S, 2P, 2P, 1]
        mp = nn.max_pool(m, (2, 2), strides=(2, 2)).astype(dt)  # [S, P, P, 1]

        def conv_stack(x):
            for i in range(3):
                x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=init, dtype=dt, name=f"mask_fcn{i+1}")(x))
            return nn.relu(
                nn.Conv(c.extractor_channel, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=init, dtype=dt, name="extractor_conv5")(x)
            )

        if c.extractor in ("RoiAlignMaskFeatureExtractor", "SameSizeRoiAlignMaskFeatureExtractor"):
            x = conv_stack(jnp.concatenate([roi_feats.astype(dt), mp], axis=-1))  # 257ch
        elif c.extractor == "DeepFeatureExtractor":
            # RoI features only, no mask concat (:119-135)
            x = conv_stack(roi_feats.astype(dt))
        elif c.extractor == "MaskFeatureExtractor":
            # own-class mask only (:113-117)
            x = mp
        elif c.extractor == "SameFeatureMask":
            # RoI passthrough (:120-124 SameFeatureMask)
            x = roi_feats.astype(dt)
        else:
            raise ValueError(f"unknown relation mask extractor {c.extractor!r}")

        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        if c.type == "CIAM":
            x = _ciam_attention(x, labels, valid, gamma, c.norm, c.pre_norm)
        else:
            x = _cam_attention(x, gamma)

        keep = (valid & (labels > 0))[:, None, None, None]
        if c.same_predictor:
            # the detector routes these through the shared mask predictor
            # (mask_relation_module.py:97-101)
            return x, keep
        x = nn.relu(
            nn.ConvTranspose(x.shape[-1], (2, 2), strides=(2, 2), kernel_init=init, dtype=dt, name="deconv_1")(x)
        )
        refined = nn.Conv(c.num_classes, (1, 1), kernel_init=init, dtype=dt, name="classifier")(x)
        return jnp.where(keep, refined.astype(mask_logits.dtype), mask_logits)
