"""Fixed-shape pytree containers replacing the reference's BoxList.

The reference threads dynamic-length BoxLists with ad-hoc extra_fields
through the model (reference:
maskrcnn_benchmark/structures/bounding_box.py:9-266). Here every stage
exchanges padded struct-of-arrays with an explicit ``valid`` mask —
the shape never depends on the data, so XLA compiles one program.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Proposals:
    """RPN/RoI proposals for a batch: [B, N, ...]."""

    boxes: jnp.ndarray  # f32 [B, N, 4] xyxy
    scores: jnp.ndarray  # f32 [B, N] (objectness)
    valid: jnp.ndarray  # bool [B, N]


@flax.struct.dataclass
class GroundTruth:
    """Padded per-image ground truth: [B, M, ...]."""

    boxes: jnp.ndarray  # f32 [B, M, 4]
    labels: jnp.ndarray  # i32 [B, M] (1..C-1; 0 unused for gt)
    valid: jnp.ndarray  # bool [B, M]
    masks: jnp.ndarray | None = None  # u8/f32 [B, M, H, W] full-res instance masks


@flax.struct.dataclass
class Detections:
    """Final per-image detections: [B, K, ...]."""

    boxes: jnp.ndarray  # f32 [B, K, 4]
    scores: jnp.ndarray  # f32 [B, K]
    labels: jnp.ndarray  # i32 [B, K]
    valid: jnp.ndarray  # bool [B, K]
    masks: jnp.ndarray | None = None  # f32 [B, K, R, R] mask-head probs (28x28)
    # source-proposal index per detection, only set by the nms_type="set"
    # path (K_HEAD>1): the host set-NMS pass keeps overlapping boxes that
    # share a head id (reference box_head/inference.py:66-67, 120-122)
    head_ids: jnp.ndarray | None = None  # i32 [B, K]
