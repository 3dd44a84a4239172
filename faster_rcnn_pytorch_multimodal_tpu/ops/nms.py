"""Fixed-shape hard NMS inside jit.

Replaces torchvision.ops.nms (C++/CUDA, used at ref proposal_layer.py:46,
filter_predictions.py:67-69, train_val.py:429, db.py:17) with an exact,
static-shape XLA formulation:

  1. scores are sorted once (descending, invalid lanes at -inf),
  2. the full pairwise IoU matrix of the (static-size) candidate set is
     computed in one shot — this is dense VPU/MXU-friendly work,
  3. a `lax.fori_loop` sweeps the score order carrying a `suppressed`
     bitmask; each step is O(N) vector work on an already-materialized IoU
     row, so the sequential chain is as thin as possible,
  4. kept candidates are compacted to a fixed `max_out` slot count with a
     stable argsort (padding slots flagged invalid).

Exactness: identical keep-set to torchvision NMS for distinct scores
(verified in tests/test_nms.py against torch CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from faster_rcnn_pytorch_multimodal_tpu.ops.iou import bbox_overlaps

NEG_INF = jnp.float32(-1e30)


@partial(jax.jit, static_argnames=("max_out",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hard NMS.

    Args:
      boxes: (N, 4) x1y1x2y2 (the +1 area convention of ops.iou applies,
        matching torchvision semantics closely enough at detection scales;
        thresholds in the reference were tuned with torchvision's no-+1 IoU,
        so we use the no-+1 form here for NMS specifically).
      scores: (N,)
      iou_threshold: suppress j if IoU(i, j) > threshold for a kept i with
        higher score.
      max_out: static output slot count.
      valid: optional (N,) bool; invalid lanes can never be kept.

    Returns:
      keep_idx: (max_out,) int32 indices into the input (0 for pad slots)
      keep_valid: (max_out,) bool
    """
    n = boxes.shape[0]
    s = scores
    if valid is not None:
        s = jnp.where(valid, s, NEG_INF)
    order = jnp.argsort(-s)
    sb = boxes[order]
    sv = s[order] > NEG_INF / 2

    # torchvision-convention IoU (no +1) for suppression decisions
    iou = _iou_no_plus1(sb, sb)

    def body(i, carry):
        suppressed, keep = carry
        row = jax.lax.dynamic_slice_in_dim(iou, i, 1, axis=0)[0]
        keep_i = jnp.logical_and(jnp.logical_not(suppressed[i]), sv[i])
        keep = keep.at[i].set(keep_i)
        newly = jnp.logical_and(keep_i, row > iou_threshold)
        idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
        newly = jnp.logical_and(newly, idx > i)
        return jnp.logical_or(suppressed, newly), keep

    suppressed0 = jnp.zeros((n,), dtype=bool)
    keep0 = jnp.zeros((n,), dtype=bool)
    _, keep = jax.lax.fori_loop(0, n, body, (suppressed0, keep0))

    # compact kept lanes (already score-ordered) into max_out slots
    rank = jnp.argsort(jnp.logical_not(keep), stable=True)[:max_out]
    keep_valid = keep[rank]
    keep_idx = jnp.where(keep_valid, order[rank], 0)
    return keep_idx.astype(jnp.int32), keep_valid


def _iou_no_plus1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU without the legacy +1 area term (torchvision NMS form)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    iw = jnp.clip(
        jnp.minimum(a[:, None, 2], b[None, :, 2])
        - jnp.maximum(a[:, None, 0], b[None, :, 0]),
        0.0,
    )
    ih = jnp.clip(
        jnp.minimum(a[:, None, 3], b[None, :, 3])
        - jnp.maximum(a[:, None, 1], b[None, :, 1]),
        0.0,
    )
    inter = iw * ih
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


__all__ = ["nms", "bbox_overlaps"]
