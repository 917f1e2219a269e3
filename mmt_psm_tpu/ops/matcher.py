"""IoU argmax matcher, masked fixed-shape version.

Same semantics as the reference Matcher (reference:
maskrcnn_benchmark/modeling/matcher.py:6-139): each prediction gets the
argmax ground-truth by quality, stratified into matched (>= high),
BETWEEN_THRESHOLDS (-2, in [low, high)), and BELOW_LOW_THRESHOLD (-1,
< low); with ``allow_low_quality_matches`` every gt force-matches its
best prediction(s), ties included (matcher.py:110-139).

Padding: a ``gt_valid`` mask marks real gt rows; padded rows are treated
as quality ``-inf`` so they can never match or force-match.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2

_NEG = -1e9


@partial(jax.jit, static_argnames=("high_threshold", "low_threshold", "allow_low_quality_matches"))
def match(
    quality: jnp.ndarray,
    gt_valid: jnp.ndarray,
    high_threshold: float,
    low_threshold: float,
    allow_low_quality_matches: bool = False,
) -> jnp.ndarray:
    """Args:
      quality: f32[M, N] match quality (M gt, N predictions).
      gt_valid: bool[M].

    Returns:
      i32[N] matches: gt index in [0, M) or -1 (below low) / -2 (between).
    """
    q = jnp.where(gt_valid[:, None], quality, _NEG)
    matched_vals = jnp.max(q, axis=0)
    matches = jnp.argmax(q, axis=0).astype(jnp.int32)
    all_matches = matches

    below = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)
    matches = jnp.where(below, BELOW_LOW_THRESHOLD, matches)
    matches = jnp.where(between, BETWEEN_THRESHOLDS, matches)

    if allow_low_quality_matches:
        # For each valid gt: its best quality; restore argmax-from-all for
        # every prediction tied at that value (matcher.py:119-139).
        highest_per_gt = jnp.max(q, axis=1, keepdims=True)  # [M, 1]
        is_best = (q == highest_per_gt) & gt_valid[:, None] & (highest_per_gt > _NEG / 2)
        force = jnp.any(is_best, axis=0)  # [N]
        matches = jnp.where(force, all_matches, matches)
    return matches


@partial(jax.jit, static_argnames=("high_threshold", "low_threshold", "top_k"))
def match_topk(
    quality: jnp.ndarray,
    gt_valid: jnp.ndarray,
    high_threshold: float,
    low_threshold: float,
    top_k: int = 2,
) -> jnp.ndarray:
    """The K_HEAD>1 matcher branch (matcher.py:89-108): per prediction the
    ``top_k`` best ground truths by quality, each stratified independently
    against the thresholds. No low-quality forcing — the reference's only
    top_k caller passes allow_low_quality_matches=False
    (box_head/loss.py:293-294).

    Returns i32[top_k, N] (row 0 = best match, identical to ``match``
    without low-quality forcing).
    """
    q = jnp.where(gt_valid[:, None], quality, _NEG)
    vals, matches = jax.lax.top_k(q.T, top_k)  # [N, K] along gt dim
    vals, matches = vals.T, matches.T.astype(jnp.int32)
    below = vals < low_threshold
    between = (vals >= low_threshold) & (vals < high_threshold)
    matches = jnp.where(below, BELOW_LOW_THRESHOLD, matches)
    matches = jnp.where(between, BETWEEN_THRESHOLDS, matches)
    return matches
