"""Fixed-shape hard NMS inside jit.

Replaces torchvision.ops.nms (C++/CUDA, used at ref proposal_layer.py:46,
filter_predictions.py:67-69, train_val.py:429, db.py:17) with a
static-shape XLA formulation:

  1. scores are sorted once (descending, invalid lanes at -inf),
  2. the sorted lanes are processed in score-ordered CHUNKS of 512: each
     chunk's internal keep set is found by Jacobi iteration of the
     suppression fixed point (keep <- alive & no higher-scored KEPT box
     overlaps me), then the chunk's kept boxes suppress every later lane
     EXACTLY with one (C, N) IoU pass.  The suppression relation is a DAG
     (edges only from higher to lower score) whose unique kernel is the
     greedy NMS solution, so the within-chunk iteration converges to it;
     `iters` bounds the WITHIN-CHUNK chain depth (32 covers anything
     non-pathological at detection thresholds — a 32-deep chain inside one
     chunk means 32 boxes each overlapping the next above threshold while
     all earlier ones were themselves suppressed; chains that span chunk
     boundaries are resolved exactly).

Chunking bounds total work at O(N*C*iters + N^2) instead of the plain
Jacobi's O(N^2 * rounds): at the train proposal shape (8 x 4096 -> 2000)
the chunked form measures 2.5 ms vs 5.8 ms for a whole-set while_loop
Jacobi and 28 ms for a whole-set fixed-32 loop, with bit-identical keeps.
Static trip counts everywhere — no data-dependent while_loop in the hot
path.

Exactness vs the greedy oracle is tested in tests/test_iou_nms.py,
including an adversarial chain case; `exact=True` switches to the
sequential scan for verification.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# python float, not jnp: a module-level jnp constant commits a backend
# at import time (slow, and fails hard if the TPU tunnel is briefly down)
NEG_INF = -1e30


# score-ordered chunk width; env-overridable for per-hardware tuning
# (512 is the v5e-measured optimum at the train proposal shape — see
# module docstring; tools/profile_step.py sweeps it via FRCNN_NMS_CHUNK)
CHUNK = int(os.environ.get("FRCNN_NMS_CHUNK", "512"))


@partial(jax.jit, static_argnames=("max_out", "iters", "exact", "rotated"))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: jnp.ndarray | None = None,
    iters: int = 32,
    exact: bool = False,
    rotated: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hard NMS (torchvision semantics: suppress IoU > threshold, no +1).

    Args:
      boxes: (N, 4) x1y1x2y2 — or (N, 5) [xc, yc, l, w, ry] with
        rotated=True (true rotated-footprint suppression, ops.rotated_iou).
      scores: (N,).
      max_out: static output slot count.
      valid: optional (N,) bool; invalid lanes can never be kept.
      iters: within-chunk Jacobi iterations (chain-depth bound per chunk).
      exact: use the O(N) sequential scan instead (reference oracle).
      rotated: boxes are rotated BEV footprints (framework extension; the
        reference's lidar NMS is always axis-aligned).

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

    if exact:
        iou = _pairwise_iou(sb, sb, rotated)

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
        keep = _chunked_greedy_keep(sb, sv, iou_threshold, iters, rotated)

    # compact kept lanes (already score-ordered) into max_out slots
    rank = jnp.argsort(jnp.logical_not(keep), stable=True)[:max_out]
    keep_valid = keep[rank]
    keep_idx = jnp.where(keep_valid, order[rank], 0)
    return keep_idx.astype(jnp.int32), keep_valid


def _chunked_greedy_keep(
    sb: jnp.ndarray,
    sv: jnp.ndarray,
    iou_threshold: float,
    iters: int,
    rotated: bool = False,
) -> jnp.ndarray:
    """Greedy keep mask over SCORE-SORTED boxes, chunked (module docstring).

    `alive` tracks lanes not yet suppressed by a kept box from an earlier
    chunk; every box above chunk k is fully decided when chunk k runs, so
    cross-chunk suppression is exact and only within-chunk chains rely on
    the Jacobi bound.
    """
    n = sb.shape[0]
    c = min(CHUNK, n)
    pad = (-n) % c
    if pad:
        sb = jnp.concatenate([sb, jnp.zeros((pad, sb.shape[1]), sb.dtype)], 0)
        sv = jnp.concatenate([sv, jnp.zeros((pad,), bool)], 0)
    m = n + pad
    lane = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)

    def outer(k, carry):
        keep, alive = carry
        col0 = k * c
        rows = jax.lax.dynamic_slice_in_dim(sb, col0, c, 0)
        iou_cr = _pairwise_iou(rows, sb, rotated)  # (C, M)
        iou_cc = jax.lax.dynamic_slice(iou_cr, (0, col0), (c, c))
        alive_c = jax.lax.dynamic_slice_in_dim(alive, col0, c, 0)
        # within-chunk suppression: row i suppresses later row j when kept
        sup_cc = (iou_cc > iou_threshold) & (ii < jj)

        def jacobi(_, kc):
            return alive_c & ~jnp.any(sup_cc & kc[:, None], axis=0)

        keep_c = jax.lax.fori_loop(0, iters, jacobi, alive_c)
        keep = jax.lax.dynamic_update_slice_in_dim(keep, keep_c, col0, 0)
        # this chunk's kept set suppresses every LATER lane, exactly
        hit = jnp.any(keep_c[:, None] & (iou_cr > iou_threshold), axis=0)
        alive = alive & ~(hit & (lane >= col0 + c))
        return keep, alive

    keep, _ = jax.lax.fori_loop(
        0, m // c, outer, (jnp.zeros((m,), bool), sv)
    )
    return keep[:n]


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, rotated: bool) -> jnp.ndarray:
    if rotated:
        from faster_rcnn_pytorch_multimodal_tpu.ops.rotated_iou import (
            rotated_iou_matrix,
        )

        return rotated_iou_matrix(a, b)
    return _iou_no_plus1(a, b)


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
