"""DEBUG draw switches (ref lib/model/config.py:19-31): anchors, anchor
targets, and proposal targets rendered onto the frames they were computed
for.  In the reference these draws lived inside the missing network.py and
were its de-facto verification tooling (SURVEY §4); here they are host-side
utilities the solver triggers on the first training batch when the matching
cfg.DEBUG flag is set.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.utils import visualization as viz


def _canvas(cfg, frame: np.ndarray) -> np.ndarray:
    if cfg.net_type == "lidar":
        return viz.bev_to_rgb(frame).astype(np.float32)
    if frame.dtype == np.uint8:  # loaders ship raw frames
        return frame.astype(np.float32)[:, :, ::-1]
    disp = frame * np.asarray(cfg.pixel_stddevs) + np.asarray(cfg.pixel_means)
    return disp[:, :, ::-1]


def _draw_boxes(canvas, boxes, color):
    from PIL import Image, ImageDraw

    img = Image.fromarray(np.clip(canvas, 0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    for b in boxes:
        draw.rectangle([float(b[0]), float(b[1]), float(b[2]), float(b[3])],
                       outline=color, width=1)
    return np.asarray(img).astype(np.float32)


def draw_anchors(cfg, batch: Dict[str, np.ndarray], out_dir: str,
                 max_draw: int = 256):
    """DEBUG.DRAW_ANCHORS: a subsample of the anchor grid over frame 0."""
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import (
        build_anchor_grid, feat_stride,
    )

    data = np.asarray(batch["data"])
    stride = feat_stride(cfg)
    h, w = data.shape[1] // stride, data.shape[2] // stride
    anchors, _ = build_anchor_grid(cfg, h, w, 1.0)
    step = max(1, len(anchors) // max_draw)
    canvas = _draw_boxes(_canvas(cfg, data[0]), anchors[::step], (80, 160, 255))
    path = os.path.join(out_dir, "anchors.png")
    viz.save_image(canvas, path)
    return path


def draw_anchor_targets(cfg, batch: Dict[str, np.ndarray], out_dir: str):
    """DEBUG.DRAW_ANCHOR_T: fg anchors green, a bg sample red, GT white
    (ref the reference's anchor-target draw switch)."""
    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_multimodal_tpu.models.detector import (
        build_anchor_grid, feat_stride,
    )
    from faster_rcnn_pytorch_multimodal_tpu.ops.iou import bbox_3d_to_bev_aabb
    from faster_rcnn_pytorch_multimodal_tpu.ops.targets import (
        anchor_target,
        effective_rpn_overlaps,
    )

    data = np.asarray(batch["data"])
    stride = feat_stride(cfg)
    h, w = data.shape[1] // stride, data.shape[2] // stride
    anchors, _ = build_anchor_grid(cfg, h, w, 1.0)
    gt = np.asarray(batch["gt_boxes"][0])
    if cfg.net_type == "lidar":
        gt_bev = np.asarray(bbox_3d_to_bev_aabb(jnp.asarray(gt[:, :7])))
        gt_bev = np.hstack([gt_bev, gt[:, 7:8]])
    else:
        gt_bev = gt
    pos_ov, neg_ov = effective_rpn_overlaps(cfg)
    at = anchor_target(
        jnp.asarray(anchors),
        jnp.asarray(gt_bev),
        jnp.asarray(batch["gt_mask"][0]),
        jnp.asarray(batch["window"][0]),
        jax.random.PRNGKey(0),
        rpn_batchsize=cfg.train.rpn_batchsize,
        fg_fraction=cfg.train.rpn_fg_fraction,
        positive_overlap=pos_ov,
        negative_overlap=neg_ov,
        clobber_positives=cfg.train.rpn_clobber_positives,
    )
    # anchor_target is compact: at.sel holds the sampled lane ids
    labels = np.asarray(at.labels)
    sel_anchors = anchors[np.asarray(at.sel)]
    canvas = _canvas(cfg, data[0])
    bg = sel_anchors[labels == 0.0]
    canvas = _draw_boxes(canvas, bg[:: max(1, len(bg) // 64)], (255, 64, 64))
    canvas = _draw_boxes(canvas, sel_anchors[labels == 1.0], (64, 255, 64))
    canvas = _draw_boxes(canvas, gt_bev[np.asarray(batch["gt_mask"][0], bool)],
                         (255, 255, 255))
    path = os.path.join(out_dir, "anchor_targets.png")
    viz.save_image(canvas, path)
    return path


def draw_proposal_targets(cfg, model, params, batch, out_dir: str):
    """DEBUG.DRAW_PROPOSAL_T: the 2nd-stage sampled RoIs — fg green,
    bg red, GT white — on frame 0."""
    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_multimodal_tpu.models.detector import (
        FasterRCNN, cast_for_compute,
    )
    from faster_rcnn_pytorch_multimodal_tpu.ops.iou import bbox_3d_to_bev_aabb
    from faster_rcnn_pytorch_multimodal_tpu.ops.targets import proposal_target

    is_lidar = cfg.net_type == "lidar"
    rng = jax.random.PRNGKey(0)
    cparams = cast_for_compute(params, cfg)
    data = jnp.asarray(batch["data"])
    feats = model.apply(cparams, data, True, method=FasterRCNN.features,
                        rngs={"dropout": rng})
    rpn_out = model.apply(cparams, feats["rpn"], method=FasterRCNN.rpn_scores,
                          rngs={"dropout": rng})
    rpn_out["anchors"] = model.apply(
        cparams, feats["rpn"], "train", method=FasterRCNN._anchors,
        rngs={"dropout": rng},
    )
    rois, scores, a3d, valid, _src = model.apply(
        cparams, rpn_out, jnp.asarray(batch["window"]), "train",
        method=FasterRCNN._propose_batch, rngs={"dropout": rng},
    )
    gt = jnp.asarray(batch["gt_boxes"])
    if is_lidar:
        gt_bev = jnp.concatenate(
            [bbox_3d_to_bev_aabb(gt[..., :7]), gt[..., 7:8]], axis=-1
        )
        true_gt = gt
    else:
        gt_bev = gt
        true_gt = jnp.zeros(gt.shape[:2] + (8,))
    b = gt.shape[0]
    rois5 = jnp.concatenate([jnp.zeros(rois.shape[:2] + (1,)), rois], -1)
    means = jnp.asarray(cfg.train.lidar_bbox_normalize_means if is_lidar
                        else cfg.train.image_bbox_normalize_means)
    stds = jnp.asarray(cfg.train.lidar_bbox_normalize_stds if is_lidar
                       else cfg.train.image_bbox_normalize_stds)
    gt_dc = jnp.asarray(
        batch.get("gt_boxes_dc", np.zeros((b, 1, 4), np.float32))
    )
    dc_mask = jnp.asarray(batch.get("dc_mask", np.zeros((b, 1), bool)))
    pt = jax.vmap(
        partial(
            proposal_target,
            num_classes=model.num_classes,
            num_bbox_elem=cfg.num_bbox_elem,
            roi_batch_size=cfg.train.roi_batch_size,
            fg_fraction=cfg.train.fg_fraction,
            fg_thresh=cfg.train.fg_thresh,
            bg_thresh_hi=cfg.train.bg_thresh_hi,
            bg_thresh_lo=cfg.train.bg_thresh_lo,
            is_lidar=is_lidar,
            ignore_dc=cfg.train.ignore_dc,
            dc_thresh=cfg.train.dc_thresh,
        ),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, None),
    )(
        rois5, scores, valid, a3d, gt_bev, jnp.asarray(batch["gt_mask"]),
        true_gt, gt_dc, dc_mask, jax.random.split(rng, b), means, stds,
    )
    labels = np.asarray(pt.labels[0])
    slot_valid = np.asarray(pt.valid[0])
    boxes = np.asarray(pt.rois[0][:, 1:5])
    canvas = _canvas(cfg, np.asarray(batch["data"][0]))
    canvas = _draw_boxes(canvas, boxes[(labels == 0) & slot_valid], (255, 64, 64))
    canvas = _draw_boxes(canvas, boxes[(labels > 0) & slot_valid], (64, 255, 64))
    canvas = _draw_boxes(
        canvas,
        np.asarray(gt_bev[0])[np.asarray(batch["gt_mask"][0], bool)],
        (255, 255, 255),
    )
    path = os.path.join(out_dir, "proposal_targets.png")
    viz.save_image(canvas, path)
    return path
