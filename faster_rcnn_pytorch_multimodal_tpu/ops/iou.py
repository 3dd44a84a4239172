"""IoU / box-geometry (pure jnp; host-side rotated IoU lives in
evaluation.eval_utils since it is only used for metric computation).

The +1 pixel-area convention matches the reference exactly
(ref: lib/utils/bbox.py:5-33) — targets, thresholds, and checkpoint parity
all depend on it.
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_overlaps(boxes: jnp.ndarray, query_boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (N, 4) boxes vs (K, 4) query boxes -> (N, K).

    ref: lib/utils/bbox.py:5-33 (+1 area convention).
    """
    areas = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    qareas = (query_boxes[:, 2] - query_boxes[:, 0] + 1.0) * (
        query_boxes[:, 3] - query_boxes[:, 1] + 1.0
    )
    iw = jnp.clip(
        jnp.minimum(boxes[:, None, 2], query_boxes[None, :, 2])
        - jnp.maximum(boxes[:, None, 0], query_boxes[None, :, 0])
        + 1.0,
        0.0,
    )
    ih = jnp.clip(
        jnp.minimum(boxes[:, None, 3], query_boxes[None, :, 3])
        - jnp.maximum(boxes[:, None, 1], query_boxes[None, :, 1])
        + 1.0,
        0.0,
    )
    inter = iw * ih
    union = areas[:, None] + qareas[None, :] - inter
    return inter / union


def bbox_3d_to_bev_aabb(boxes7: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned BEV envelope (x1,y1,x2,y2) of rotated 7-DoF boxes.

    Graphics-Gems AABB of the rotated rectangle
    (ref: lib/utils/bbox.py:256-336): half-extents
    ex = (|l cos ry| + |w sin ry|)/2, ey = (|l sin ry| + |w cos ry|)/2.
    """
    x, y = boxes7[..., 0], boxes7[..., 1]
    l, w = boxes7[..., 3], boxes7[..., 4]
    ry = boxes7[..., 6]
    c, s = jnp.abs(jnp.cos(ry)), jnp.abs(jnp.sin(ry))
    ex = (l * c + w * s) / 2.0
    ey = (l * s + w * c) / 2.0
    return jnp.stack([x - ex, y - ey, x + ex, y + ey], axis=-1)
