#!/usr/bin/env python
"""Offline Waymo Open ETL: tfrecord segments -> per-frame point-cloud .npy +
FRONT camera .png + lidar AND image labels JSON (the formats the waymo
dataset layer and the reference pipeline consume).

Re-implementation of ref tools/waymo_unpack_combined.py:58-494:
  * dual-return point clouds concatenated (ref :101-109),
  * per-frame .npy [x, y, z, intensity, elongation] (ref :110-113),
  * FRONT camera image cropped (top 300 / bottom 30 px) + saved (ref :122-136),
  * laser + FRONT camera calibration export (ref :144-166),
  * per-box 3D label + projected 2D box: distance-weighted average of the
    in-box-lidar-point projection and the 3D-label-corner projection
    (ref :239-267 + bbox_weighted_average :354-372),
  * truncation from the clip ratio; boxes >90% truncated dropped (ref :268-274),
  * per-box meta: pts, trunc, avg_intensity, avg_elongation, return_ratio
    (ref :279-314), difficulty (ref :317-322).

The projection helpers are pure numpy (unit-tested offline); only
`unpack_segment` needs tensorflow + waymo-open-dataset (import-gated so the
rest of the framework never depends on them).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

# FRONT camera crop (ref waymo_unpack_combined.py:24-25)
TOP_CROP = 300
BOT_CROP = 30
MAX_DIST = 75.0  # weighted-average normalizer (ref :354-372, "lidar range")


# ---------------------------------------------------------------------------
# Pure-numpy projection helpers (ref :496-700; testable without TF)
# ---------------------------------------------------------------------------


def vehicle_to_image_transform(intrinsic, extrinsic) -> np.ndarray:
    """(3, 4) vehicle-frame -> image-pixel projection for a Waymo camera
    (ref get_image_transform :677-699): pinhole model x axes swap x inverse
    extrinsic."""
    camera_model = np.array(
        [
            [intrinsic[0], 0, intrinsic[2], 0],
            [0, intrinsic[1], intrinsic[3], 0],
            [0, 0, 1, 0],
        ]
    )
    axes = np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], np.float64
    )
    extrinsic = np.asarray(extrinsic, np.float64).reshape(4, 4)
    return camera_model @ axes @ np.linalg.inv(extrinsic)


def project_points_to_image(v2i: np.ndarray, points_xyz: np.ndarray) -> np.ndarray:
    """(N, 3) vehicle-frame points -> (N, 3) [u, v, depth] (ref
    points_3D_to_image :529-554)."""
    ones = np.ones((len(points_xyz), 1))
    p = np.hstack([points_xyz[:, :3], ones]) @ v2i.T  # (N, 3)
    out = p.copy()
    out[:, 0] = p[:, 0] / p[:, 2]
    out[:, 1] = p[:, 1] / p[:, 2]
    return out


def box3d_corners(box7) -> np.ndarray:
    """(8, 3) vehicle-frame corners of [xc,yc,zc,l,w,h,ry] (ref
    get_box_transformation_matrix :662-675)."""
    xc, yc, zc, l, w, h, ry = [float(v) for v in box7[:7]]
    c, s = np.cos(ry), np.sin(ry)
    m = np.array(
        [
            [l * c, -w * s, 0, xc],
            [l * s, w * c, 0, yc],
            [0, 0, h, zc],
            [0, 0, 0, 1],
        ]
    )
    corners = []
    for k in (0, 1):
        for j in (0, 1):
            for i in (0, 1):
                v = m @ np.array([k - 0.5, j - 0.5, i - 0.5, 1.0])
                corners.append(v[:3])
    return np.asarray(corners)


def project_box3d_to_image(v2i: np.ndarray, box7) -> np.ndarray | None:
    """3D label -> projected (8, 2) corner pixels, or None if any corner is
    behind the camera (ref label_3D_to_image :569-600)."""
    corners = box3d_corners(box7)
    p = project_points_to_image(v2i, corners)
    if np.any(p[:, 2] < 0):
        return None
    return p[:, :2]


def bbox_of_points(pts2d: np.ndarray):
    """Enclosing (x1, y1, x2, y2) of 2D points (ref compute_2d_bounding_box)."""
    return (
        float(np.min(pts2d[:, 0])),
        float(np.min(pts2d[:, 1])),
        float(np.max(pts2d[:, 0])),
        float(np.max(pts2d[:, 1])),
    )


def weighted_2d_box(bbox_pc, bbox_label, dist: float, max_dist: float = MAX_DIST):
    """Distance-weighted average of the point-projection box and the
    label-projection box (ref bbox_weighted_average :354-372): near objects
    lean on the label projection, far ones on the observed points."""
    w = max(dist, 0.0) / max_dist
    return tuple(
        bbox_pc[i] * w + bbox_label[i] * (1.0 - w) for i in range(4)
    )


def clip_2d_box(box, img_w: int, img_h: int):
    """ref clip_2d_bounding_box :513-519."""
    return (
        min(max(0.0, box[0]), img_w),
        min(max(0.0, box[1]), img_h),
        min(max(0.0, box[2]), img_w),
        min(max(0.0, box[3]), img_h),
    )


def compute_truncation(box, clipped) -> float:
    """Fraction of the projected box clipped away (ref :521-527)."""
    clipped_area = (clipped[2] - clipped[0]) * (clipped[3] - clipped[1])
    orig_area = (box[2] - box[0]) * (box[3] - box[1])
    if clipped_area <= 0:
        return 1.0  # fully outside the frame
    return 1.0 - clipped_area / max(orig_area, 1e-12)


def project_label_to_2d(
    v2i: np.ndarray,
    box7,
    in_box_points: np.ndarray,
    img_w: int,
    img_h: int,
    top_crop: int = TOP_CROP,
):
    """One 3D label -> (clipped 2D box, truncation) or None when the label
    projects behind the camera or is >90% truncated (ref :239-274)."""
    label_corners = project_box3d_to_image(v2i, box7)
    if label_corners is None:
        return None
    bbox_label = bbox_of_points(label_corners)

    bbox_pc = None
    if len(in_box_points):
        p = project_points_to_image(v2i, in_box_points[:, :3])
        vis = (
            (p[:, 0] >= 0) & (p[:, 0] < img_w)
            & (p[:, 1] >= 0) & (p[:, 1] < img_h + top_crop)
            & (p[:, 2] >= 0)
        )
        if vis.any():
            bbox_pc = bbox_of_points(p[vis, :2])
    if bbox_pc is None:
        bbox_pc = bbox_label  # ref :259-260

    # account for the image top crop (ref :262-264), then distance-weight
    shift = lambda b: (b[0], b[1] - top_crop, b[2], b[3] - top_crop)
    dist = float(box7[0])
    box2d = weighted_2d_box(shift(bbox_pc), shift(bbox_label), dist)
    clipped = clip_2d_box(box2d, img_w, img_h)
    trunc = compute_truncation(box2d, clipped)
    if trunc > 0.90:  # ref :273-274
        return None
    return clipped, trunc


def parse_args(argv=None, variant="combined"):
    p = argparse.ArgumentParser(
        description=f"Unpack Waymo Open tfrecords ({variant})"
    )
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


def unpack_segment(tfrecord_path: str, out_dir: str, mode: str, max_range: float,
                   variant: str = "combined"):
    """One tfrecord segment -> frames on disk.  Returns
    (lidar_label_dicts, image_label_dicts).

    variant selects the reference's standalone production surfaces:
      * "combined" — point clouds + images + both label files
        (ref tools/waymo_unpack_combined.py),
      * "lidar" — point clouds + lidar labels only
        (ref tools/waymo_unpack_lidar.py),
      * "projected_cam" — images + 2D labels PROJECTED from the 3D laser
        labels; the cloud is computed for in-box stats/truncation but not
        saved (ref tools/waymo_unpack_projected_cam.py),
      * "camera" — images + the dataset's NATIVE 2D camera labels; no
        lidar work at all (ref tools/waymo_unpack_camera.py).
    """
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2
    from waymo_open_dataset.utils import frame_utils

    want_pc = variant in ("combined", "lidar")
    want_img = variant in ("combined", "projected_cam", "camera")
    want_cloud = variant != "camera"  # camera-only never parses lidar

    labels = []
    image_labels = []
    ds = tf.data.TFRecordDataset(tfrecord_path, compression_type="")
    for rec_idx, data in enumerate(ds):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        frame_id = f"{frame.context.name}_{rec_idx}"

        # --- point cloud: first + second return concat (ref :101-109) ---
        cloud = np.zeros((0, 5), np.float32)
        cloud2 = np.zeros((0, 5), np.float32)
        if want_cloud:
            (ri, cp, _, ri_top_pose) = (
                frame_utils.parse_range_image_and_camera_projection(frame)
            )
            clouds = []
            for return_index in (0, 1):
                pts, cp_pts = frame_utils.convert_range_image_to_point_cloud(
                    frame, ri, cp, ri_top_pose, ri_index=return_index,
                    keep_polar_features=True,
                )
                # keep_polar_features layout: [range, intensity, elongation, x, y, z]
                xyz = np.concatenate([p[:, 3:6] for p in pts], axis=0)
                feat = np.concatenate([p[:, 1:3] for p in pts], axis=0)
                c = np.hstack([xyz, feat]).astype(np.float32)
                clouds.append(c[np.linalg.norm(c[:, :2], axis=1) < max_range])
            cloud2 = clouds[1]  # second return, for return_ratio (ref :244)
            cloud = np.concatenate(clouds, 0)

        if want_pc:
            pc_path = os.path.join(out_dir, mode, "point_clouds", f"{frame_id}.npy")
            np.save(pc_path, cloud)

        # --- FRONT camera: decode, crop top/bottom, save (ref :122-136) ---
        img_w = img_h = 0
        for img in frame.images:
            if img.name == dataset_pb2.CameraName.FRONT:
                arr = tf.io.decode_jpeg(img.image).numpy()
                arr = arr[TOP_CROP:, :, :]
                arr = arr[:-BOT_CROP, :, :]
                img_h, img_w = arr.shape[:2]
                if want_img:
                    im_path = os.path.join(
                        out_dir, mode, "images", f"{frame_id}.png"
                    )
                    with open(im_path, "wb") as f:
                        f.write(tf.io.encode_png(arr).numpy())
                break

        # --- calibration export (ref :144-166) ---
        json_calib = {}
        for calib in frame.context.laser_calibrations:
            if calib.name == dataset_pb2.LaserName.TOP:
                json_calib["beam_inclinations"] = list(calib.beam_inclinations)
                json_calib["beam_inclination_max"] = calib.beam_inclination_max
                json_calib["beam_inclination_min"] = calib.beam_inclination_min
                json_calib["extrinsic_transform"] = list(calib.extrinsic.transform)
        for calib in frame.context.camera_calibrations:
            if calib.name == dataset_pb2.CameraName.FRONT:
                json_calib["cam_intrinsic"] = list(calib.intrinsic)
                json_calib["cam_extrinsic_transform"] = list(
                    calib.extrinsic.transform
                )
        v2i = (
            vehicle_to_image_transform(
                json_calib["cam_intrinsic"], json_calib["cam_extrinsic_transform"]
            )
            if "cam_intrinsic" in json_calib
            else None
        )

        # --- labels (ref :207-322) ---
        boxes, classes, diffs, metas, ids = [], [], [], [], []
        boxes_2d, classes_2d, diffs_2d, metas_2d, ids_2d = [], [], [], [], []
        if variant == "camera":
            # native 2D camera labels (ref waymo_unpack_camera.py:64-121)
            for cam_labels in frame.camera_labels:
                if cam_labels.name != dataset_pb2.CameraName.FRONT:
                    continue
                for label in cam_labels.labels:
                    b = label.box
                    x1 = b.center_x - b.length / 2.0
                    y1 = b.center_y - b.width / 2.0 - TOP_CROP
                    x2 = b.center_x + b.length / 2.0
                    y2 = b.center_y + b.width / 2.0 - TOP_CROP
                    clipped = clip_2d_box((x1, y1, x2, y2), img_w, img_h)
                    if clipped is None:
                        continue
                    boxes_2d.append({
                        "x1": clipped[0], "y1": clipped[1],
                        "x2": clipped[2], "y2": clipped[3],
                    })
                    classes_2d.append(int(label.type))
                    diffs_2d.append(
                        1 if label.detection_difficulty_level == 0
                        else int(label.detection_difficulty_level)
                    )
                    metas_2d.append({
                        "pts": 0, "avg_intensity": 0.0, "avg_elongation": 0.0,
                        "return_ratio": 0.0,
                        "trunc": float(compute_truncation((x1, y1, x2, y2), clipped)),
                    })
                    ids_2d.append(label.id)
        for lab in (() if variant == "camera" else frame.laser_labels):
            b = lab.box
            dist = float(np.sqrt(b.center_x**2 + b.center_y**2))
            if dist > max_range:
                continue
            box7 = [
                b.center_x, b.center_y, b.center_z,
                b.length, b.width, b.height, b.heading,
            ]
            # points inside the (BEV-rotated) box for meta stats
            inside = _points_in_box(cloud, b)
            inside2 = _points_in_box(cloud2, b)
            n_pts = int(inside.sum())
            n_pts2 = int(inside2.sum())
            meta = {
                "pts": n_pts,
                "avg_intensity": float(cloud[inside, 3].mean()) if n_pts else 0.0,
                "avg_elongation": float(cloud[inside, 4].mean()) if n_pts else 0.0,
                # second-return / first-return point ratio (ref :287-289)
                "return_ratio": (n_pts2 / n_pts) if n_pts else 0.0,
                "trunc": 0.0,
            }
            difficulty = (
                1
                if lab.detection_difficulty_level == 0
                else int(lab.detection_difficulty_level)
            )
            boxes.append(
                {
                    "xc": b.center_x, "yc": b.center_y, "zc": b.center_z,
                    "lx": b.length, "wy": b.width, "hz": b.height,
                    "heading": b.heading,
                }
            )
            classes.append(int(lab.type))
            diffs.append(difficulty)
            metas.append(meta)
            ids.append(lab.id)

            # projected 2D box for the image pipeline (ref :239-314)
            if v2i is not None and img_w and variant != "lidar":
                res = project_label_to_2d(
                    v2i, box7, cloud[inside], img_w, img_h + BOT_CROP
                )
                if res is not None:
                    (x1, y1, x2, y2), trunc = res
                    boxes_2d.append({"x1": x1, "y1": y1, "x2": x2, "y2": y2})
                    classes_2d.append(int(lab.type))
                    diffs_2d.append(difficulty)
                    m2 = dict(meta)
                    m2["trunc"] = float(trunc)
                    metas_2d.append(m2)
                    ids_2d.append(lab.id)

        stats = frame.context.stats
        scene_type = [
            {
                "tod": stats.time_of_day or "Day",
                "weather": stats.weather or "sunny",
            }
        ]
        common = {
            "assoc_frame": frame_id,
            "scene_type": scene_type,
            "calibration": [json_calib],
        }
        labels.append(
            {
                **common,
                "id": ids,
                "box": boxes,
                "class": classes,
                "difficulty": diffs,
                "meta": metas,
            }
        )
        image_labels.append(
            {
                **common,
                "id": ids_2d,
                "box": boxes_2d,
                "class": classes_2d,
                "difficulty": diffs_2d,
                "meta": metas_2d,
            }
        )
    return labels, image_labels


def _points_in_box(cloud: np.ndarray, b) -> np.ndarray:
    """Boolean mask of cloud points inside the rotated 3D box."""
    dx = cloud[:, 0] - b.center_x
    dy = cloud[:, 1] - b.center_y
    c, s = np.cos(-b.heading), np.sin(-b.heading)
    lx = dx * c - dy * s
    ly = dx * s + dy * c
    return (
        (np.abs(lx) < b.length / 2)
        & (np.abs(ly) < b.width / 2)
        & (np.abs(cloud[:, 2] - b.center_z) < b.height / 2)
    )


def main(argv=None, variant="combined"):
    args = parse_args(argv, variant)
    _require_waymo_deps()
    subdirs = {"combined": ("point_clouds", "images", "labels"),
               "lidar": ("point_clouds", "labels"),
               "projected_cam": ("images", "labels"),
               "camera": ("images", "labels")}[variant]
    for sub in subdirs:
        os.makedirs(os.path.join(args.out_dir, args.mode, sub), exist_ok=True)
    segments = sorted(
        os.path.join(args.tfrecord_dir, f)
        for f in os.listdir(args.tfrecord_dir)
        if f.endswith(".tfrecord")
    )
    print(f"{len(segments)} segments -> {args.out_dir}/{args.mode} ({variant})")
    all_labels, all_image_labels = [], []
    with ProcessPoolExecutor(max_workers=args.workers) as pool:
        futures = [
            pool.submit(unpack_segment, seg, args.out_dir, args.mode,
                        args.max_range, variant)
            for seg in segments
        ]
        for fut in futures:
            lidar, image = fut.result()
            all_labels.extend(lidar)
            all_image_labels.extend(image)
    label_dir = os.path.join(args.out_dir, args.mode, "labels")
    if variant in ("combined", "lidar"):
        with open(os.path.join(label_dir, "lidar_labels.json"), "w") as f:
            json.dump(all_labels, f)
    if variant in ("combined", "projected_cam", "camera"):
        with open(os.path.join(label_dir, "image_labels.json"), "w") as f:
            json.dump(all_image_labels, f)
    print(
        f"wrote {len(all_labels)} lidar + {len(all_image_labels)} image frame "
        f"labels to {label_dir}"
    )


if __name__ == "__main__":
    main()
