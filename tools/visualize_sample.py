#!/usr/bin/env python
"""Draw one dataset frame with its ground truth (ref tools/visualize_sample.py)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--db", dest="db_name", default="synthetic", type=str)
    p.add_argument("--net_type", default="image", type=str)
    p.add_argument("--frame", default=0, type=int)
    p.add_argument("--augment", default=0, type=int)
    p.add_argument("--out", default="sample.png", type=str)
    p.add_argument("--data_dir", default=None, type=str)
    p.add_argument("--cache_dir", default=None, type=str)
    p.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = p.parse_args(argv)

    from test_net import args_to_train_ns
    from trainval_net import build_config, build_dataset

    cfg = build_config(args_to_train_ns(args))
    from faster_rcnn_pytorch_multimodal_tpu.utils import visualization as viz

    db = build_dataset(cfg, args.db_name, "train")
    frame = db.frame(args.frame, augment=bool(args.augment))
    if cfg.net_type == "lidar":
        # rasterize the raw points for display
        from functools import partial

        import jax

        from faster_rcnn_pytorch_multimodal_tpu.ops.voxelize import (
            bev_grid_size,
            voxelize_bev,
        )

        if "data" in frame:
            bev = np.asarray(frame["data"])
        else:
            scale = float(cfg.train.scales[0])
            ny, nx, _ = bev_grid_size(cfg, scale)
            import jax.numpy as jnp

            bev = np.asarray(
                jax.jit(
                    partial(
                        voxelize_bev,
                        x_range=cfg.lidar.x_range,
                        y_range=cfg.lidar.y_range,
                        z_range=cfg.lidar.z_range,
                        voxel_len=cfg.lidar.voxel_len / scale,
                        voxel_height=cfg.lidar.voxel_height,
                        num_x=nx,
                        num_y=ny,
                        num_slices=cfg.lidar.num_slices,
                        num_meta=cfg.lidar.num_meta_channel,
                    )
                )(
                    jnp.asarray(frame["points"]),
                    jnp.ones(len(frame["points"]), bool),
                )
            )
        canvas = viz.draw_detections_bev(bev, np.zeros((0, 8)), gt7=frame["gt_boxes"])
    else:
        d = np.asarray(frame["data"])
        disp = (
            d.astype(np.float32)
            if d.dtype == np.uint8
            else d * np.asarray(cfg.pixel_stddevs) + np.asarray(cfg.pixel_means)
        )
        canvas = viz.draw_bounding_boxes(disp[:, :, ::-1], frame["gt_boxes"], db.classes)
    viz.save_image(canvas, args.out)
    print(f"wrote {args.out} ({len(frame['gt_boxes'])} GT boxes)")


if __name__ == "__main__":
    main()
