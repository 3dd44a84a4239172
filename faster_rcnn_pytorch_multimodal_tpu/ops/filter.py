"""Final-detection filtering: per-class threshold -> NMS -> gather.

Fixed-shape re-design of ref lib/utils/filter_predictions.py:23-130:
the per-class python loop becomes a vmap over classes; outputs are padded
(num_classes, max_dets, ·) tensors + validity, converted to the reference's
ragged per-class list layout on the host (`to_per_class_lists`).

Faithful details:
  * image boxes clamp to [0, frame/scale - 1] (ref :86-94),
  * lidar NMS runs on the center±dim axis-aligned BEV footprint IGNORING
    rotation (ref nms_hstack_torch :55-63 — the auto-rotating AABB is
    commented out upstream),
  * uncertainty tensors gather through the same (inds, keep) path
    (ref :113-124).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.ops.nms import nms


@partial(
    jax.jit,
    static_argnames=("num_classes", "bbox_elem", "max_dets", "is_lidar", "rotated_nms"),
)
def filter_detections(
    cls_prob: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    roi_valid: jnp.ndarray,
    *,
    num_classes: int,
    bbox_elem: int,
    max_dets: int = 100,
    thresh: float = 0.5,
    nms_thresh: float = 0.6,
    is_lidar: bool = False,
    rotated_nms: bool = False,
) -> Dict[str, jnp.ndarray]:
    """One frame.  cls_prob (S, K), pred_boxes (S, E*K), roi_valid (S,).

    Returns dict of (K, max_dets, ·) padded tensors:
      boxes (E), scores, valid, src_idx (index into the S rois, for
      gathering uncertainty tensors through the same keep path).
    Class 0 (background) lanes are always invalid.
    """
    s = cls_prob.shape[0]

    def per_class(j):
        scores = cls_prob[:, j]
        boxes = jax.lax.dynamic_slice_in_dim(
            pred_boxes, j * bbox_elem, bbox_elem, axis=1
        )
        valid = roi_valid & (scores > thresh) & (j > 0)
        rotated = False
        if is_lidar and rotated_nms:
            # framework extension (TEST.ROTATED_NMS): true rotated-footprint
            # suppression — 7-DoF [xc,yc,zc,l,w,h,ry] -> BEV [xc,yc,l,w,ry]
            nms_boxes = boxes[:, jnp.array([0, 1, 3, 4, 6])]
            rotated = True
        elif is_lidar:
            nms_boxes = jnp.stack(
                [
                    boxes[:, 0] - boxes[:, 3] / 2.0,
                    boxes[:, 1] - boxes[:, 4] / 2.0,
                    boxes[:, 0] + boxes[:, 3] / 2.0,
                    boxes[:, 1] + boxes[:, 4] / 2.0,
                ],
                axis=1,
            )
        else:
            nms_boxes = boxes[:, :4]
        keep, keep_valid = nms(
            nms_boxes, scores, nms_thresh, max_dets, valid=valid, rotated=rotated
        )
        return {
            "boxes": boxes[keep],
            "scores": jnp.where(keep_valid, scores[keep], 0.0),
            "valid": keep_valid,
            "src_idx": keep,
        }

    return jax.vmap(per_class)(jnp.arange(num_classes))


def clamp_image_boxes(
    pred_boxes: jnp.ndarray, info: jnp.ndarray, bbox_elem: int = 4
) -> jnp.ndarray:
    """ref filter_predictions.py:86-94: clamp per-class image boxes to the
    unscaled frame.  info = [xmin, xmax, ymin, ymax, ..., scale]."""
    scale = info[-1]
    w = (info[1] - info[0]) / scale - 1.0
    h = (info[3] - info[2]) / scale - 1.0
    b = pred_boxes.reshape(pred_boxes.shape[:-1] + (-1, bbox_elem))
    b = jnp.stack(
        [
            jnp.clip(b[..., 0], 0.0, None),
            jnp.clip(b[..., 1], 0.0, None),
            jnp.clip(b[..., 2], None, w),
            jnp.clip(b[..., 3], None, h),
        ],
        axis=-1,
    )
    return b.reshape(pred_boxes.shape)


def to_per_class_lists(
    filtered: Dict[str, np.ndarray],
    uncertainties: Dict[str, np.ndarray],
    num_classes: int,
    bbox_elem: int,
) -> Tuple[list, list]:
    """Host-side: padded tensors -> the reference's ragged layout
    (all_boxes[j] = (n_j, E+1) [box..., score]; all_uncertainty[j] dict,
    ref filter_predictions.py:102-130 + test.py:206-221)."""
    all_boxes = [np.empty((0, bbox_elem + 1), np.float32) for _ in range(num_classes)]
    all_uc = [{} for _ in range(num_classes)]
    boxes = np.asarray(filtered["boxes"])
    scores = np.asarray(filtered["scores"])
    valid = np.asarray(filtered["valid"])
    src = np.asarray(filtered["src_idx"])
    for j in range(1, num_classes):
        v = valid[j]
        if not v.any():
            continue
        all_boxes[j] = np.hstack(
            [boxes[j][v], scores[j][v][:, None]]
        ).astype(np.float32)
        uc_j = {}
        for key, tensor in uncertainties.items():
            t = np.asarray(tensor)
            sel = t[src[j][v]]
            if key in ("a_bbox_var", "e_bbox_var") and t.ndim == 2 and t.shape[1] == num_classes * bbox_elem:
                sel = t[src[j][v], j * bbox_elem : (j + 1) * bbox_elem]
            elif sel.ndim == 1:
                sel = sel[:, None]
            uc_j[key] = sel
        all_uc[j] = uc_j
    return all_boxes, all_uc
