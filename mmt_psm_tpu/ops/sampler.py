"""Balanced positive/negative sampler, fixed-shape.

Semantics follow the reference BalancedPositiveNegativeSampler
(reference: maskrcnn_benchmark/modeling/balanced_positive_negative_sampler.py:5-72):
pick up to ``batch_size * positive_fraction`` positives uniformly at
random, fill the remainder with random negatives; items labelled -1
(ignore) are never sampled.

Instead of dynamic boolean masks, this returns a fixed ``batch_size``
vector of indices plus validity/positivity masks: slot i holds the i-th
sampled positive for i < num_pos, then negatives; trailing slots (when
fewer candidates exist than ``batch_size``) are marked invalid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("batch_size", "positive_fraction"))
def sample(
    rng: jax.Array,
    labels: jnp.ndarray,
    batch_size: int,
    positive_fraction: float,
):
    """Args:
      rng: PRNG key.
      labels: i32[N] with >=1 positive, 0 negative, -1 ignore (matches the
        reference's convention at balanced_positive_negative_sampler.py:30-35).
      batch_size: total samples per image.
      positive_fraction: target positive share.

    Returns:
      (idx i32[batch_size], is_pos bool[batch_size], valid bool[batch_size])
    """
    n = labels.shape[0]
    is_pos = labels >= 1
    is_neg = labels == 0

    r = jax.random.uniform(rng, (n,))
    # Random permutation of positives first (invalid pushed to the end).
    pos_order = jnp.argsort(jnp.where(is_pos, r, 2.0))
    neg_order = jnp.argsort(jnp.where(is_neg, r, 2.0))

    num_pos_avail = jnp.sum(is_pos)
    num_neg_avail = jnp.sum(is_neg)
    max_pos = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(num_pos_avail, max_pos)
    num_neg = jnp.minimum(num_neg_avail, batch_size - num_pos)

    slot = jnp.arange(batch_size)
    take_pos = slot < num_pos
    # For negative slots, index into neg_order at (slot - num_pos).
    neg_slot = jnp.clip(slot - num_pos, 0, n - 1)
    pos_slot = jnp.clip(slot, 0, n - 1)
    idx = jnp.where(take_pos, pos_order[pos_slot], neg_order[neg_slot]).astype(jnp.int32)
    valid = slot < (num_pos + num_neg)
    return idx, take_pos & valid, valid
