#!/usr/bin/env python
"""Cluster GT box shapes to pick anchor scales/ratios
(ref tools/bbox_k_means_clustering.py): k-means over (w, h) of a dataset's
ground-truth boxes, reported as base-16 anchor scales + aspect ratios."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def kmeans(points: np.ndarray, k: int, iters: int = 100, seed: int = 0):
    rng = np.random.RandomState(seed)
    centers = points[rng.choice(len(points), k, replace=False)]
    for _ in range(iters):
        d = np.linalg.norm(points[:, None] - centers[None], axis=2)
        assign = d.argmin(1)
        new = np.array(
            [points[assign == j].mean(0) if (assign == j).any() else centers[j] for j in range(k)]
        )
        if np.allclose(new, centers):
            break
        centers = new
    return centers[np.argsort(centers.prod(1))]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--db", dest="db_name", default="synthetic", type=str)
    p.add_argument("--net_type", default="image", type=str)
    p.add_argument("--k", default=5, type=int)
    p.add_argument("--data_dir", default=None, type=str)
    p.add_argument("--cache_dir", default=None, type=str)
    p.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = p.parse_args(argv)

    from test_net import args_to_train_ns
    from trainval_net import build_config, build_dataset

    cfg = build_config(args_to_train_ns(args))
    db = build_dataset(cfg, args.db_name, "train")

    whs = []
    for i in range(len(db)):
        boxes = db.roidb[i]["boxes"] if hasattr(db, "roidb") else db.frame(i)["gt_boxes"]
        b = np.atleast_2d(boxes)
        if b.shape[1] >= 7:  # lidar 7-dof: use (l, w)
            whs.append(b[:, 3:5])
        else:
            whs.append(np.stack([b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], 1))
    wh = np.concatenate(whs, 0)
    centers = kmeans(wh, args.k)
    print("cluster centers (w, h):")
    for c in centers:
        size = np.sqrt(c[0] * c[1])
        print(
            f"  {c[0]:8.1f} x {c[1]:8.1f}  -> scale {size / 16:.2f} (base 16), "
            f"ratio {c[1] / max(c[0], 1e-6):.2f}"
        )


if __name__ == "__main__":
    main()
