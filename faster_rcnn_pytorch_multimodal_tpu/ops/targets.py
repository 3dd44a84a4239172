"""Fixed-shape target assignment (RPN anchor targets + 2nd-stage RoI targets).

TPU re-design of the reference's index-compressing, per-frame numpy/torch
layers (ref: lib/layer_utils/anchor_target_layer.py:22-332,
lib/layer_utils/proposal_target_layer.py:22-284):

  * no index compression — every anchor keeps its lane, selection state is
    carried in masks (the reference's `_unmap` becomes a no-op),
  * random subsampling without replacement is expressed as "rank anchors by
    a uniform random key within the candidate set and keep the first k" —
    identical in distribution to np.random.choice(replace=False),
  * "with replacement" top-ups (2nd stage only) wrap the ranked candidate
    list modulo the candidate count, mirroring the reference's repeat trick
    (ref proposal_target_layer.py:275-284),
  * everything is vmappable over the batch dimension.

Known reference quirk replicated on purpose: in the anchor target layer the
don't-care suppression writes -1 into labels that are still all -1 and is
then clobbered by the bg/fg assignment, so IGNORE_DC has no effect at the
RPN stage (ref anchor_target_layer.py:57-62 runs before :77-89).  We keep
that behavior (and the dc argument) for training-distribution parity.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from faster_rcnn_pytorch_multimodal_tpu.ops.box_transform import (
    bbox_transform,
    lidar_3d_bbox_transform,
)
from faster_rcnn_pytorch_multimodal_tpu.ops.iou import bbox_overlaps

_EPS = 1.1920929e-07  # torch.finfo(float32).eps (ref :71); python float
# so importing the module does not initialize a device backend


def _rank_within(candidate: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Random rank (0 = first drawn) among candidates; non-candidates get
    ranks after all candidates.  Equivalent to a uniform random permutation
    of the candidate set."""
    n = candidate.shape[0]
    key = jax.random.uniform(rng, (n,))
    key = jnp.where(candidate, key, 2.0)
    perm = jnp.argsort(key)
    return jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))


class AnchorTargets(NamedTuple):
    """COMPACT sampled-lane representation (K = fg quota + rpn_batchsize).

    The reference materializes labels/targets/weights for every anchor lane
    and lets the loss mask them (fine at batch 1 on GPU); at FPN stride 4
    that is 768k lanes x 8 frames of (N, 4) f32 tensors — ~70 ms/step of
    pure HBM traffic on v5e for values that are zero everywhere but the
    <= 384 sampled lanes.  The subsampling top_k already yields the sampled
    lane INDICES, so everything downstream (regression targets, weights,
    losses) is computed on K lanes; `expand_anchor_targets` scatters back
    to full lanes for parity tests / debug draws."""

    sel: jnp.ndarray  # (K,) int32 sampled anchor lane ids
    labels: jnp.ndarray  # (K,) float32 in {-1, 0, 1}; -1 = inactive slot
    bbox_targets: jnp.ndarray  # (K, 4)
    bbox_inside_weights: jnp.ndarray  # (K, 4)
    bbox_outside_weights: jnp.ndarray  # (K, 4)


def effective_rpn_overlaps(cfg) -> tuple:
    """(positive, negative) RPN overlap thresholds actually trained with:
    lidar nets override TRAIN.RPN_*_OVERLAP with LIDAR.RPN_*_OVERLAP when
    set (> 0) — rotated BEV boxes overlap AABB anchors less than image
    boxes do (config.py LidarConfig rationale).  Single source of truth
    for the detector's forward_train and the DEBUG.DRAW_ANCHOR_T draw."""
    pos = cfg.train.rpn_positive_overlap
    neg = cfg.train.rpn_negative_overlap
    if cfg.net_type == "lidar":
        if cfg.lidar.rpn_positive_overlap > 0:
            pos = cfg.lidar.rpn_positive_overlap
        if cfg.lidar.rpn_negative_overlap > 0:
            neg = cfg.lidar.rpn_negative_overlap
    return pos, neg


@partial(
    jax.jit,
    static_argnames=(
        "rpn_batchsize",
        "fg_fraction",
        "positive_overlap",
        "negative_overlap",
        "clobber_positives",
    ),
)
def anchor_target(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    window: jnp.ndarray,
    rng: jax.Array,
    *,
    rpn_batchsize: int = 256,
    fg_fraction: float = 0.5,
    positive_overlap: float = 0.7,
    negative_overlap: float = 0.3,
    clobber_positives: bool = False,
) -> AnchorTargets:
    """RPN label/target assignment for ONE frame (vmap over batch).

    Args:
      anchors: (N, 4) all anchors (full grid, never index-compressed).
      gt_boxes: (G, 5) padded [x1, y1, x2, y2, cls].
      gt_mask: (G,) validity of the padded GT rows.
      window: (4,) [xmin, xmax, ymin, ymax] inside-frame bound
        (ref anchor_target_layer.py:37-45 uses info[0..3]).
      rng: PRNG key for fg/bg subsampling.

    ref: lib/layer_utils/anchor_target_layer.py:22-165 (torch variant).
    """
    n = anchors.shape[0]
    inside = (
        (anchors[:, 0] >= window[0])
        & (anchors[:, 1] >= window[2])
        & (anchors[:, 2] < window[1])
        & (anchors[:, 3] < window[3])
    )
    any_gt = jnp.any(gt_mask)

    overlaps = bbox_overlaps(anchors, gt_boxes[:, :4])  # (N, G)
    overlaps = jnp.where(gt_mask[None, :], overlaps, -1.0)

    argmax_overlaps = jnp.argmax(overlaps, axis=1)
    max_overlaps = jnp.max(overlaps, axis=1)  # -1 when no valid gt

    labels = jnp.full((n,), -1.0)
    if not clobber_positives:
        labels = jnp.where(inside & (max_overlaps < negative_overlap), 0.0, labels)

    # per-GT best anchor (among inside anchors) is always fg (ref :68-81);
    # ties share the label, matching `overlaps == gt_max_overlaps`
    col_overlaps = jnp.where(inside[:, None], overlaps, -2.0)
    gt_max = jnp.maximum(jnp.max(col_overlaps, axis=0), _EPS)  # (G,)
    is_gt_best = jnp.any(
        (col_overlaps == gt_max[None, :]) & gt_mask[None, :], axis=1
    )
    labels = jnp.where(inside & is_gt_best, 1.0, labels)
    labels = jnp.where(inside & (max_overlaps >= positive_overlap), 1.0, labels)
    if clobber_positives:
        labels = jnp.where(inside & (max_overlaps < negative_overlap), 0.0, labels)
    # degenerate frame with zero GT: everything inside is background
    labels = jnp.where(any_gt, labels, jnp.where(inside, 0.0, -1.0))

    # subsample fg to fg_fraction * batch, then bg to fill the batch.
    # "random choice without replacement" = keep the k smallest of a uniform
    # random key within the candidate set; top_k on the key beats a full
    # argsort over the ~500k anchor lanes AND hands back the sampled lane
    # indices, so the whole regression tail runs on K lanes
    rng_fg, rng_bg = jax.random.split(rng)
    num_fg = min(int(fg_fraction * rpn_batchsize), n)
    k_bg = min(rpn_batchsize, n)
    fg = labels == 1.0
    fg_key = jnp.where(fg, jax.random.uniform(rng_fg, (n,)), 2.0)
    fg_vals, fg_sel = jax.lax.top_k(-fg_key, num_fg)
    fg_valid = fg_vals > -1.5  # real fg candidates (key <= 1)
    fg_count = jnp.sum(fg_valid)

    num_bg = rpn_batchsize - fg_count  # dynamic, <= rpn_batchsize
    bg = labels == 0.0
    bg_key = jnp.where(bg, jax.random.uniform(rng_bg, (n,)), 2.0)
    bg_vals, bg_sel = jax.lax.top_k(-bg_key, k_bg)
    bg_valid = (bg_vals > -1.5) & (jnp.arange(k_bg) < num_bg)

    sel = jnp.concatenate([fg_sel, bg_sel])  # (K,)
    sel_labels = jnp.concatenate(
        [jnp.where(fg_valid, 1.0, -1.0), jnp.where(bg_valid, 0.0, -1.0)]
    )

    # regression targets on the K sampled lanes only: gathers of K rows are
    # latency-fine (it was the N-row gathers that cost ~50 ms on v5e)
    anchors_sel = anchors[sel]
    matched_gt = gt_boxes[argmax_overlaps[sel], :4]
    bbox_targets = bbox_transform(anchors_sel, matched_gt)
    bbox_targets = jnp.where(any_gt, bbox_targets, jnp.zeros_like(bbox_targets))

    is_fg = (sel_labels == 1.0)[:, None]
    bbox_inside_weights = jnp.where(is_fg, 1.0, 0.0) * jnp.ones((1, 4))
    num_examples = jnp.sum(sel_labels >= 0.0).astype(jnp.float32)
    uniform_w = 1.0 / jnp.maximum(num_examples, 1.0)
    bbox_outside_weights = jnp.where(
        (sel_labels >= 0.0)[:, None], uniform_w, 0.0
    ) * jnp.ones((1, 4))
    return AnchorTargets(
        sel, sel_labels, bbox_targets, bbox_inside_weights, bbox_outside_weights
    )


def expand_anchor_targets(at: AnchorTargets, n: int) -> AnchorTargets:
    """Scatter compact per-lane outputs back to the full N-lane layout of
    the reference's anchor_target_layer (for parity tests / debug draws).
    Unsampled lanes get label -1 and zero targets/weights."""
    # inactive slots carry ARBITRARY lane ids (top_k pads with
    # non-candidate lanes), which may collide with active slots of the
    # other class — use max/add scatters so inactive writes are no-ops
    active = at.labels >= 0.0
    labels = jnp.full((n,), -1.0).at[at.sel].max(
        jnp.where(active, at.labels, -1.0)
    )
    zero = jnp.zeros((n, 4))
    w = active[:, None].astype(jnp.float32)
    return AnchorTargets(
        jnp.arange(n, dtype=jnp.int32),
        labels,
        zero.at[at.sel].add(at.bbox_targets * w),
        zero.at[at.sel].add(at.bbox_inside_weights * w),
        zero.at[at.sel].add(at.bbox_outside_weights * w),
    )


class ProposalTargets(NamedTuple):
    labels: jnp.ndarray  # (S,) int32, 0 = background
    rois: jnp.ndarray  # (S, 5) [batch_idx, x1, y1, x2, y2]
    anchors_3d: jnp.ndarray  # (S, 7)
    roi_scores: jnp.ndarray  # (S,)
    bbox_targets: jnp.ndarray  # (S, E*K)
    bbox_inside_weights: jnp.ndarray  # (S, E*K)
    bbox_outside_weights: jnp.ndarray  # (S, E*K)
    valid: jnp.ndarray  # (S,) bool — False only in the no-candidate corner


@partial(
    jax.jit,
    static_argnames=(
        "num_classes",
        "num_bbox_elem",
        "roi_batch_size",
        "fg_fraction",
        "fg_thresh",
        "bg_thresh_hi",
        "bg_thresh_lo",
        "is_lidar",
        "ignore_dc",
        "dc_thresh",
    ),
)
def proposal_target(
    rois: jnp.ndarray,
    roi_scores: jnp.ndarray,
    roi_valid: jnp.ndarray,
    anchors_3d: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    true_gt_boxes: jnp.ndarray,
    gt_boxes_dc: jnp.ndarray,
    dc_mask: jnp.ndarray,
    rng: jax.Array,
    normalize_means: jnp.ndarray,
    normalize_stds: jnp.ndarray,
    *,
    num_classes: int,
    num_bbox_elem: int = 4,
    roi_batch_size: int = 256,
    fg_fraction: float = 0.25,
    fg_thresh: float = 0.6,
    bg_thresh_hi: float = 0.5,
    bg_thresh_lo: float = 0.0,
    is_lidar: bool = False,
    ignore_dc: bool = False,
    dc_thresh: float = 0.5,
) -> ProposalTargets:
    """2nd-stage RoI sampling + per-class regression targets for ONE frame.

    Args:
      rois: (R, 5) proposals [batch_idx, x1, y1, x2, y2] (BEV AABB for lidar).
      roi_scores: (R,), roi_valid: (R,) proposal validity from the NMS pad.
      anchors_3d: (R, 7) matched 3D anchors carried through the proposal
        path (unused rows arbitrary for image nets).
      gt_boxes: (G, 5) padded [x1, y1, x2, y2, cls] (BEV AABB for lidar).
      true_gt_boxes: (G, 8) padded 7-DoF [xc,yc,zc,l,w,h,ry,cls] (lidar).
      gt_boxes_dc / dc_mask: (D, 4)/(D,) padded don't-care areas.
      normalize_means/stds: (E,) target normalization
        (ref cfg.TRAIN.{IMAGE,LIDAR}.BBOX_NORMALIZE_*).

    ref: lib/layer_utils/proposal_target_layer.py:22-262.
    """
    r = rois.shape[0]
    s = roi_batch_size

    valid = roi_valid
    if ignore_dc:
        ov_dc = bbox_overlaps(rois[:, 1:5], gt_boxes_dc)
        ov_dc = jnp.where(dc_mask[None, :], ov_dc, -1.0)
        valid = valid & (jnp.max(ov_dc, axis=1) < dc_thresh)

    overlaps = bbox_overlaps(rois[:, 1:5], gt_boxes[:, :4])
    overlaps = jnp.where(gt_mask[None, :] & valid[:, None], overlaps, -1.0)
    max_overlaps = jnp.max(overlaps, axis=1)
    gt_assignment = jnp.argmax(overlaps, axis=1)

    fg_cand = valid & (max_overlaps >= fg_thresh)
    bg_cand = valid & (max_overlaps < bg_thresh_hi) & (max_overlaps >= bg_thresh_lo)
    nfg = jnp.sum(fg_cand)
    nbg = jnp.sum(bg_cand)

    fg_quota = int(round(fg_fraction * s))
    # ref :206-231: both present -> fg = min(quota, nfg); only fg -> all
    # slots fg (with replacement); only bg -> all slots bg
    fg_take = jnp.where(
        (nfg > 0) & (nbg > 0),
        jnp.minimum(fg_quota, nfg),
        jnp.where(nfg > 0, s, 0),
    )

    rng_fg, rng_bg = jax.random.split(rng)
    fg_rank = _rank_within(fg_cand, rng_fg)
    bg_rank = _rank_within(bg_cand, rng_bg)
    # ranked candidate lists: fg_list[j] = index of the j-th drawn fg
    fg_list = jnp.zeros((r,), jnp.int32).at[fg_rank].set(
        jnp.arange(r, dtype=jnp.int32)
    )
    bg_list = jnp.zeros((r,), jnp.int32).at[bg_rank].set(
        jnp.arange(r, dtype=jnp.int32)
    )

    slot = jnp.arange(s, dtype=jnp.int32)
    is_fg_slot = slot < fg_take
    fg_idx = fg_list[jnp.where(nfg > 0, slot % jnp.maximum(nfg, 1), 0)]
    bg_idx = bg_list[
        jnp.where(nbg > 0, (slot - fg_take) % jnp.maximum(nbg, 1), 0)
    ]
    keep = jnp.where(is_fg_slot, fg_idx, bg_idx)
    slot_valid = jnp.where(is_fg_slot, nfg > 0, nbg > 0)

    labels = gt_boxes[gt_assignment[keep], 4]
    labels = jnp.where(is_fg_slot & slot_valid, labels, 0.0).astype(jnp.int32)

    out_rois = rois[keep]
    out_scores = roi_scores[keep]
    out_anchors = anchors_3d[keep]

    if is_lidar:
        matched = true_gt_boxes[gt_assignment[keep], :7]
        targets = lidar_3d_bbox_transform(out_rois[:, 1:5], out_anchors, matched)
    else:
        matched = gt_boxes[gt_assignment[keep], :4]
        targets = bbox_transform(out_rois[:, 1:5], matched)
    targets = (targets - normalize_means[None, :]) / normalize_stds[None, :]

    # expand to the E-of-E*K per-class layout (ref :64-103)
    e, k = num_bbox_elem, num_classes
    cls_onehot = jax.nn.one_hot(labels, k)  # (S, K)
    fg_slot_f = (is_fg_slot & slot_valid & (labels > 0)).astype(jnp.float32)
    bbox_targets = (cls_onehot[:, :, None] * targets[:, None, :]).reshape(s, k * e)
    bbox_targets = bbox_targets * fg_slot_f[:, None]
    bbox_inside = (cls_onehot[:, :, None] * fg_slot_f[:, None, None]) * jnp.ones(
        (1, 1, e)
    )
    bbox_inside = bbox_inside.reshape(s, k * e)
    bbox_outside = (bbox_inside > 0).astype(jnp.float32)

    return ProposalTargets(
        labels,
        out_rois,
        out_anchors,
        out_scores,
        bbox_targets,
        bbox_inside,
        bbox_outside,
        slot_valid,
    )
