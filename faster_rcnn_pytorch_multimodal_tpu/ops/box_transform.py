"""Box encode/decode transforms (pure jnp, shape-polymorphic over leading dims).

Replicates the reference's NONSTANDARD diagonal-normalized parameterization:
dx, dy are divided by sqrt(w^2 + h^2) instead of w / h
(ref: lib/model/bbox_transform.py:55,64-65,84,94-95).  Checkpoints are only
compatible with this variant — do not "fix" it to the textbook form.

7-DoF LiDAR transforms follow ref bbox_transform.py:16-49 (encode) and
:174-233 (decode): the proposal RoI's BEV extent supplies (ctr, l, w) while
the matched 3D anchor supplies (z, h); heading targets are the raw GT ry
(the anchor heading is implied by the RoI aspect ratio and not subtracted).

Uncertainty inverse transforms: ref bbox_transform.py:107-169.
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Encode GT boxes w.r.t. example RoIs -> (N, 4) [dx, dy, dw, dh].

    ref: lib/model/bbox_transform.py:52-70 (diagonal-normalized dx, dy).
    """
    ex_w = ex_rois[..., 2] - ex_rois[..., 0] + 1.0
    ex_h = ex_rois[..., 3] - ex_rois[..., 1] + 1.0
    ex_diag = jnp.sqrt(ex_w**2 + ex_h**2)
    ex_cx = ex_rois[..., 0] + 0.5 * ex_w
    ex_cy = ex_rois[..., 1] + 0.5 * ex_h

    gt_w = gt_rois[..., 2] - gt_rois[..., 0] + 1.0
    gt_h = gt_rois[..., 3] - gt_rois[..., 1] + 1.0
    gt_cx = gt_rois[..., 0] + 0.5 * gt_w
    gt_cy = gt_rois[..., 1] + 0.5 * gt_h

    return jnp.stack(
        [
            (gt_cx - ex_cx) / ex_diag,
            (gt_cy - ex_cy) / ex_diag,
            jnp.log(gt_w / ex_w),
            jnp.log(gt_h / ex_h),
        ],
        axis=-1,
    )


def bbox_transform_inv(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Decode (N, 4K) deltas against (N, 4) boxes -> (N, 4K) x1y1x2y2.

    ref: lib/model/bbox_transform.py:75-105 (dx, dy scaled by box diagonal).
    """
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    diag = jnp.sqrt(w**2 + h**2)
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    d = deltas.reshape(deltas.shape[:-1] + (-1, 4))
    pred_cx = d[..., 0] * diag[..., None] + cx[..., None]
    pred_cy = d[..., 1] * diag[..., None] + cy[..., None]
    pred_w = jnp.exp(d[..., 2]) * w[..., None]
    pred_h = jnp.exp(d[..., 3]) * h[..., None]

    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out.reshape(deltas.shape)


def clip_boxes(boxes: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Clamp (..., 4K) boxes to window [xmin, xmax, ymin, ymax, ...].

    ref: lib/model/bbox_transform.py:235-257 — x clamps to [info[0],
    info[1]-1], y to [info[2], info[3]-1].
    """
    b = boxes.reshape(boxes.shape[:-1] + (-1, 4))
    x1 = jnp.clip(b[..., 0], window[0], window[1] - 1)
    y1 = jnp.clip(b[..., 1], window[2], window[3] - 1)
    x2 = jnp.clip(b[..., 2], window[0], window[1] - 1)
    y2 = jnp.clip(b[..., 3], window[2], window[3] - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(boxes.shape)


# ---------------------------------------------------------------------------
# 7-DoF LiDAR transforms
# ---------------------------------------------------------------------------


def _roi_bev_geometry(rois: jnp.ndarray):
    """(lengths, widths, ctr_x, ctr_y, diag) of BEV RoIs [x1,y1,x2,y2]."""
    lengths = rois[..., 2] - rois[..., 0] + 1.0
    widths = rois[..., 3] - rois[..., 1] + 1.0
    ctr_x = rois[..., 0] + lengths / 2.0
    ctr_y = rois[..., 1] + widths / 2.0
    diag = jnp.sqrt(lengths**2 + widths**2)
    return lengths, widths, ctr_x, ctr_y, diag


def lidar_3d_bbox_transform(
    ex_rois: jnp.ndarray, ex_anchors: jnp.ndarray, gt_rois: jnp.ndarray
) -> jnp.ndarray:
    """Encode 7-DoF GT vs (BEV RoI, 3D anchor) pairs -> (N, 7) targets.

    ex_rois: (N, 4) BEV [x1,y1,x2,y2]; ex_anchors: (N, 7); gt_rois: (N, 7)
    [xc,yc,zc,l,w,h,ry].  ref: lib/model/bbox_transform.py:16-49 — xy deltas
    diagonal-normalized, z by anchor height, ry target is raw GT heading.
    """
    lengths, widths, cx, cy, diag = _roi_bev_geometry(ex_rois)
    anc_z = ex_anchors[..., 2]
    anc_h = ex_anchors[..., 5]
    return jnp.stack(
        [
            (gt_rois[..., 0] - cx) / diag,
            (gt_rois[..., 1] - cy) / diag,
            (gt_rois[..., 2] - anc_z) / anc_h,
            jnp.log(gt_rois[..., 3] / lengths),
            jnp.log(gt_rois[..., 4] / widths),
            jnp.log(gt_rois[..., 5] / anc_h),
            gt_rois[..., 6],
        ],
        axis=-1,
    )


def lidar_3d_bbox_transform_inv(
    rois: jnp.ndarray, anchors_3d: jnp.ndarray, deltas: jnp.ndarray
) -> jnp.ndarray:
    """Decode (N, 7K) deltas -> (N, 7K) [xc,yc,zc,l,w,h,ry] (voxel units).

    ref: lib/model/bbox_transform.py:174-233 — (ctr, l, w) come from the BEV
    RoI, (z, h) from the matched anchor, heading is the raw prediction.
    """
    lengths, widths, cx, cy, diag = _roi_bev_geometry(rois)
    heights = anchors_3d[..., 5]
    cz = anchors_3d[..., 2]

    d = deltas.reshape(deltas.shape[:-1] + (-1, 7))
    pred = jnp.stack(
        [
            d[..., 0] * diag[..., None] + cx[..., None],
            d[..., 1] * diag[..., None] + cy[..., None],
            d[..., 2] * heights[..., None] + cz[..., None],
            jnp.exp(d[..., 3]) * lengths[..., None],
            jnp.exp(d[..., 4]) * widths[..., None],
            jnp.exp(d[..., 5]) * heights[..., None],
            d[..., 6],
        ],
        axis=-1,
    )
    return pred.reshape(deltas.shape)


# ---------------------------------------------------------------------------
# Uncertainty inverse transforms (log-std in delta space -> variance in
# pixel/voxel space)
# ---------------------------------------------------------------------------


def uncertainty_transform_inv(
    boxes: jnp.ndarray, uncertainty: jnp.ndarray
) -> jnp.ndarray:
    """Image-domain bbox variance: (N, 4K) uc -> (N, 4K) variances.

    ref: lib/model/bbox_transform.py:107-128 — x/y scaled by RoI length/
    width, w/h via exp(u)-1, then squared.  NOTE the reference strides the
    4-element uncertainty with ::7 offsets (a latent indexing bug when
    K > 1); we use the 4-element layout it actually produces for K groups.
    """
    lengths = boxes[..., 2] - boxes[..., 0] + 1.0
    widths = boxes[..., 3] - boxes[..., 1] + 1.0
    u = uncertainty.reshape(uncertainty.shape[:-1] + (-1, 4))
    out = jnp.stack(
        [
            u[..., 0] * lengths[..., None],
            u[..., 1] * widths[..., None],
            jnp.exp(u[..., 2]) - 1.0,
            jnp.exp(u[..., 3]) - 1.0,
        ],
        axis=-1,
    )
    return (out**2).reshape(uncertainty.shape)


def lidar_3d_uncertainty_transform_inv(
    rois: jnp.ndarray, anchors_3d: jnp.ndarray, uncertainty: jnp.ndarray
) -> jnp.ndarray:
    """LiDAR-domain bbox variance: (N, 7K) uc -> (N, 7K) variances.

    ref: lib/model/bbox_transform.py:132-169.
    """
    lengths = rois[..., 2] - rois[..., 0] + 1.0
    widths = rois[..., 3] - rois[..., 1] + 1.0
    heights = anchors_3d[..., 5]
    u = uncertainty.reshape(uncertainty.shape[:-1] + (-1, 7))
    out = jnp.stack(
        [
            u[..., 0] * lengths[..., None],
            u[..., 1] * widths[..., None],
            u[..., 2] * heights[..., None],
            jnp.exp(u[..., 3]) - 1.0,
            jnp.exp(u[..., 4]) - 1.0,
            jnp.exp(u[..., 5]) - 1.0,
            u[..., 6],
        ],
        axis=-1,
    )
    return (out**2).reshape(uncertainty.shape)
