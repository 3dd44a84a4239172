#!/usr/bin/env python
"""Re-evaluate cached detections (mirrors ref tools/reval.py: load
detections.pkl written by test_net and recompute the metrics without
rerunning the network)."""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Re-evaluate cached detections")
    p.add_argument("detections", type=str, help="path to detections.pkl")
    p.add_argument("--db", dest="db_name", default="synthetic", type=str)
    p.add_argument("--net_type", default="image", type=str)
    p.add_argument("--eval_type", default=None, type=str,
                   help="2d | bev | bev_aa | 3d (default from config)")
    p.add_argument("--iou", default=None, type=float)
    p.add_argument("--data_dir", default=None, type=str)
    p.add_argument("--cache_dir", default=None, type=str)
    p.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import types

    from trainval_net import build_config, build_dataset

    ns = types.SimpleNamespace(
        cfg_file=None, net_type=args.net_type, net="res101", en_full_net=1,
        en_fpn=0, en_aleatoric=0, en_epistemic=0, uc_sort_type=None,
        preload=None, fixed_blocks=None, scale=None, train_batch_size=None,
        val_batch_size=None, iter=None, data_dir=args.data_dir,
        cache_dir=args.cache_dir, db_name=args.db_name, set_cfgs=args.set_cfgs,
    )
    cfg = build_config(ns)
    from faster_rcnn_pytorch_multimodal_tpu.evaluation.eval_utils import evaluate_class

    db = build_dataset(cfg, args.db_name, "val")
    with open(args.detections, "rb") as f:
        all_boxes = pickle.load(f)

    num_classes = len(db.classes)
    bbox_elem = cfg.num_bbox_elem
    eval_type = args.eval_type or (
        cfg.lidar.eval_type if cfg.net_type == "lidar" else "2d"
    )
    iou_t = args.iou if args.iou is not None else (0.7 if cfg.net_type == "lidar" else 0.5)

    gt_frames, detections = {}, {j: [] for j in range(1, num_classes)}
    n_frames = min(len(db), len(all_boxes[1]))
    for i in range(n_frames):
        fid = f"frame_{i:06d}"
        f = db.frame(i, augment=False)
        gt = f["gt_boxes"]
        gt_frames[fid] = {"boxes": gt[:, :bbox_elem], "cls": gt[:, -1].astype(int)}
        for j in range(1, num_classes):
            for row in np.atleast_2d(all_boxes[j][i]) if len(all_boxes[j][i]) else []:
                detections[j].append(
                    {"frame_id": fid, "bbox": row[:bbox_elem], "confidence": row[-1]}
                )

    maps = []
    for j in range(1, num_classes):
        gtc = {fid: {"boxes": g["boxes"][g["cls"] == j]} for fid, g in gt_frames.items()}
        res = evaluate_class(detections[j], gtc, iou_thresh=iou_t, eval_type=eval_type)
        print(f"class {db.classes[j]}: AP={res['ap']:.4f} "
              f"(tp={res['tp']} fp={res['fp']} npos={res['npos']})")
        maps.append(res["ap"])
    print(f"mAP ({eval_type} @ {iou_t}): {np.mean(maps):.4f}")


if __name__ == "__main__":
    main()
