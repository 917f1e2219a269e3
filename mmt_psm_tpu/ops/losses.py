"""Loss library.

Covers the reference's loss zoo: smooth-L1 / Huber
(reference: maskrcnn_benchmark/layers/smooth_l1_loss.py:6-19), the
dispatcher losses in modeling/losses.py:3-131 (entropy, balanced /
weighted BCE, KL, MSE), the mask head's dice/MSE helpers
(roi_heads/mask_head/loss.py:19-35), PSM's sharpen + soft cross-entropy
(roi_heads/box_head/loss.py:267-315), and a sigmoid focal loss (named in
the upstream API; this fork's cfg exposes ALPHA/GAMMA knobs at
config/defaults.py:270-271 though its relation head uses BCE/MSE).

All functions are mask-aware: ``weight`` (or ``valid``) lets padded rows
contribute exactly zero, which is how fixed-shape batches emulate the
reference's dynamic-length tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(loss, weight, normalizer=None):
    if weight is None:
        return jnp.mean(loss)
    loss = loss * weight
    denom = jnp.sum(weight) if normalizer is None else normalizer
    return jnp.sum(loss) / jnp.maximum(denom, 1.0)


def smooth_l1(input, target, beta: float = 1.0 / 9, weight=None, normalizer=None):
    """Huber loss with the reference's beta form (smooth_l1_loss.py:6-16)."""
    n = jnp.abs(input - target)
    loss = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    return _masked_mean(loss, weight, normalizer)


def smooth_l1_sum(input, target, beta: float = 1.0 / 9, weight=None):
    n = jnp.abs(input - target)
    loss = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    if weight is not None:
        loss = loss * weight
    return jnp.sum(loss)


def sigmoid_bce(logits, targets, weight=None, normalizer=None):
    """Binary cross-entropy with logits (mask head loss: mask_head/loss.py:176)."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _masked_mean(loss, weight, normalizer)


def bce_probs(probs, targets, weight=None, normalizer=None, eps: float = 1e-6):
    """BCE on probabilities (relation-NMS trains on score*logit products —
    relation_module.py:213)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    loss = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))
    return _masked_mean(loss, weight, normalizer)


def weighted_bce_probs(probs, targets, pos_weight, neg_weight, valid=None, eps: float = 1e-6):
    """Per-example-weighted BCE (reference modeling/losses.py weighted_bce)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    w = jnp.where(targets > 0.5, pos_weight, neg_weight)
    if valid is not None:
        w = w * valid
    loss = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p)) * w
    return jnp.sum(loss) / jnp.maximum(jnp.sum(w), 1e-6)


def softmax_ce(logits, labels, weight=None, normalizer=None):
    """Sparse-label cross entropy (box head classification, box_head/loss.py:139)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return _masked_mean(nll, weight, normalizer)


def soft_ce(logits, target_probs, weight=None, normalizer=None):
    """Soft-target cross entropy: -sum_c q_c log p_c. PSM's student-vs-teacher
    classification consistency (box_head/loss.py:267-287)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.sum(target_probs * logp, axis=-1)
    return _masked_mean(nll, weight, normalizer)


def kl_div(logits, target_probs, weight=None, normalizer=None, eps: float = 1e-10):
    """KL(target || softmax(logits)) (reference losses.py kl dispatcher)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    kl = jnp.sum(target_probs * (jnp.log(target_probs + eps) - logp), axis=-1)
    return _masked_mean(kl, weight, normalizer)


def mse(input, target, weight=None, normalizer=None):
    return _masked_mean((input - target) ** 2, weight, normalizer)


def entropy_loss(logits, weight=None, normalizer=None):
    """Mean softmax entropy (reference losses.py entropy)."""
    p = jax.nn.softmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ent = -jnp.sum(p * logp, axis=-1)
    return _masked_mean(ent, weight, normalizer)


def dice_loss(probs, targets, valid=None, eps: float = 1.0):
    """Dice loss per instance then mean (mask_head/loss.py:19-27 pattern)."""
    axes = tuple(range(1, probs.ndim))
    inter = jnp.sum(probs * targets, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(targets, axis=axes)
    dice = (2.0 * inter + eps) / (denom + eps)
    loss = 1.0 - dice
    return _masked_mean(loss, valid)


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0, weight=None, normalizer=None):
    """Standard sigmoid focal loss (upstream maskrcnn-benchmark SigmoidFocalLoss
    CUDA op; this fork exposes only the ALPHA/GAMMA cfg knobs)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    loss = alpha_t * ((1.0 - p_t) ** gamma) * ce
    return _masked_mean(loss, weight, normalizer)


def sharpen(probs, temperature: float = 0.5, axis: int = -1):
    """Temperature sharpening p^(1/T) / sum (PSM, box_head/loss.py:311-315)."""
    p = probs ** (1.0 / temperature)
    return p / jnp.sum(p, axis=axis, keepdims=True)
