#!/usr/bin/env python
"""Single-frame inference demo with detection drawing (mirrors
ref tools/demo.py: load weights, run one frame, draw boxes; the reference's
version is broken — it imports the nonexistent model.test.im_detect,
SURVEY.md §7 known-bugs — this one actually runs)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Faster R-CNN demo")
    p.add_argument("--weights_file", default=None, type=str)
    p.add_argument("--db", dest="db_name", default="synthetic", type=str)
    p.add_argument("--net", default="res101", type=str)
    p.add_argument("--net_type", default="image", type=str)
    p.add_argument("--frame", default=0, type=int, help="dataset frame index")
    p.add_argument("--image", default=None, type=str, help="or a raw image path")
    p.add_argument("--thresh", default=0.5, type=float)
    p.add_argument("--out", default="demo_out.png", type=str)
    p.add_argument("--en_aleatoric", default=0, type=int)
    p.add_argument("--en_epistemic", default=0, type=int)
    p.add_argument("--en_fpn", default=0, type=int)
    p.add_argument("--en_full_net", default=1, type=int)
    p.add_argument("--uc_sort_type", default=None, type=str)
    p.add_argument(
        "--class_colors", default=0, type=int,
        help="1 = fixed tab10 color per class (demo_all_bboxes mode)",
    )
    p.add_argument("--scale", default=None, type=float)
    p.add_argument("--data_dir", default=None, type=str)
    p.add_argument("--cache_dir", default=None, type=str)
    p.add_argument("--cfg", dest="cfg_file", default=None, type=str)
    p.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from test_net import args_to_train_ns
    from trainval_net import build_config, build_dataset

    ns = args_to_train_ns(args)
    ns.fixed_blocks = None
    ns.iter = None
    cfg = build_config(ns)

    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_multimodal_tpu.models.detector import (
    FasterRCNN,
    as_dropout_rng,
    cast_for_compute,
)
    from faster_rcnn_pytorch_multimodal_tpu.ops.filter import (
        filter_detections,
        to_per_class_lists,
    )
    from faster_rcnn_pytorch_multimodal_tpu.utils import visualization as viz

    db = build_dataset(cfg, args.db_name, "val")
    num_classes = len(db.classes)
    model = FasterRCNN(cfg=cfg, num_classes=num_classes)

    if args.image:
        import cv2

        raw = cv2.imread(args.image).astype(np.float32)
        img = (raw - np.asarray(cfg.pixel_means)) / np.asarray(cfg.pixel_stddevs)
        frame = {
            "data": img,
            "window": np.array([0, img.shape[1], 0, img.shape[0]], np.float32),
            "gt_boxes": np.zeros((0, 5), np.float32),
        }
    else:
        frame = db.frame(args.frame, augment=False)

    data = jnp.asarray(frame["data"])[None]
    window = jnp.asarray(frame["window"])[None]
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)({"params": rng, "dropout": rng}, data, window)
    if args.weights_file:
        from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (
            restore_reconciled,
        )

        params = restore_reconciled(args.weights_file, jax.device_get(params))

    fwd = jax.jit(
        lambda p, d, w, key: model.apply(
            cast_for_compute(p, cfg), d, w, method=FasterRCNN.forward_test,
            rngs={"dropout": as_dropout_rng(key)}
        )
    )
    out = fwd(params, data, window, jax.random.PRNGKey(1))
    is_lidar = cfg.net_type == "lidar"
    filt = filter_detections(
        out["cls_prob"][0], out["bbox_pred"][0], out["roi_valid"][0],
        num_classes=num_classes, bbox_elem=cfg.num_bbox_elem,
        max_dets=cfg.test.max_dets, thresh=args.thresh,
        nms_thresh=cfg.test.nms_thresh, is_lidar=is_lidar,
        rotated_nms=cfg.test.rotated_nms,
    )
    uc = {k: np.asarray(v[0]) for k, v in out.get("uncertainties", {}).items()}
    boxes_j, uc_j = to_per_class_lists(filt, uc, num_classes, cfg.num_bbox_elem)

    total = sum(len(boxes_j[j]) for j in range(1, num_classes))
    print(f"{total} detections over threshold {args.thresh}")
    for j in range(1, num_classes):
        for row in boxes_j[j]:
            print(f"  {db.classes[j]}: score={row[-1]:.3f} box={row[:-1].round(1)}")

    if is_lidar:
        canvas = viz.draw_detections_bev(
            np.asarray(frame.get("data", np.zeros((100, 100, 15)))),
            np.vstack([boxes_j[j] for j in range(1, num_classes) if len(boxes_j[j])])
            if total else np.zeros((0, 8)),
            gt7=frame.get("gt_boxes"),
            sort_key=cfg.uc.sort_type,
        )
    else:
        raw = np.asarray(frame["data"])
        if np.issubdtype(raw.dtype, np.integer):
            disp = raw.astype(np.float32)  # dataset frames ship raw uint8
        else:
            # float frames are pre-normalized; un-normalize for display
            disp = raw * np.asarray(cfg.pixel_stddevs) + np.asarray(cfg.pixel_means)
        canvas = disp[:, :, ::-1]  # BGR -> RGB
        for j in range(1, num_classes):
            if len(boxes_j[j]):
                canvas = viz.draw_detections_image(
                    canvas, boxes_j[j], class_name=db.classes[j],
                    sort_key=cfg.uc.sort_type,
                    color=viz.TAB10[(j - 1) % len(viz.TAB10)]
                    if args.class_colors else None,
                )
    viz.save_image(canvas, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
