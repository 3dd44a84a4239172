"""Fixed-shape hard NMS inside jit.

Replaces torchvision.ops.nms (C++/CUDA, used at ref proposal_layer.py:46,
filter_predictions.py:67-69, train_val.py:429, db.py:17) with a
static-shape XLA formulation:

  1. scores are sorted once (descending, invalid lanes at -inf),
  2. the full pairwise IoU matrix of the (static-size) candidate set is
     computed in one shot (dense VPU work),
  3. the greedy keep set is found by Jacobi iteration of the suppression
     fixed point: keep <- valid & no higher-scored KEPT box overlaps me.
     The suppression relation is a DAG (edges only from higher to lower
     score), and a DAG has a UNIQUE kernel = the greedy NMS solution, so
     the alternating iteration converges to it; `iters` bounds the chain
     depth (32 covers anything non-pathological at detection thresholds —
     a 32-deep suppression chain means 32 boxes each overlapping the next
     above threshold while all earlier ones were themselves suppressed).
     Each iteration is one masked (N, N) reduction — VPU-friendly, no
     sequential per-box scan.

Exactness vs the greedy oracle is tested in tests/test_iou_nms.py,
including an adversarial chain case; `exact=True` switches to the
sequential scan for verification.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# python float, not jnp: a module-level jnp constant commits a backend
# at import time (slow, and fails hard if the TPU tunnel is briefly down)
NEG_INF = -1e30


@partial(jax.jit, static_argnames=("max_out", "iters", "exact"))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: jnp.ndarray | None = None,
    iters: int = 32,
    exact: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hard NMS (torchvision semantics: suppress IoU > threshold, no +1).

    Args:
      boxes: (N, 4) x1y1x2y2.
      scores: (N,).
      max_out: static output slot count.
      valid: optional (N,) bool; invalid lanes can never be kept.
      iters: Jacobi iterations (suppression-chain depth bound).
      exact: use the O(N) sequential scan instead (reference oracle).

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

    iou = _iou_no_plus1(sb, sb)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jdx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # S[j, i]: higher-scored j suppresses i when kept
    sup = (iou > iou_threshold) & (idx < jdx) & sv[:, None]

    if exact:
        def body(i, carry):
            suppressed, keep = carry
            row = jax.lax.dynamic_slice_in_dim(iou, i, 1, axis=0)[0]
            keep_i = jnp.logical_and(jnp.logical_not(suppressed[i]), sv[i])
            keep = keep.at[i].set(keep_i)
            lane = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
            newly = keep_i & (row > iou_threshold) & (lane > i)
            return jnp.logical_or(suppressed, newly), keep

        _, keep = jax.lax.fori_loop(
            0, n, body, (jnp.zeros((n,), bool), jnp.zeros((n,), bool))
        )
    else:
        # Jacobi iteration with early exit: real detection sets converge in
        # ~3-6 rounds, so a while_loop beats running the full bound
        def cond(state):
            i, _keep, done = state
            return jnp.logical_and(i < iters, jnp.logical_not(done))

        def step(state):
            i, keep, _ = state
            new_keep = sv & ~jnp.any(sup & keep[:, None], axis=0)
            return i + 1, new_keep, jnp.all(new_keep == keep)

        _, keep, _ = jax.lax.while_loop(cond, step, (0, sv, jnp.bool_(False)))

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


__all__ = ["nms"]
