"""Real dataset loaders against synthesized fixture trees that mimic the
reference ETL output formats (waymo JSON, kitti txt/calib)."""

import json
import math
import os

import numpy as np
import pytest

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.data import augment as aug
from faster_rcnn_pytorch_multimodal_tpu.data.datasets import get_db
from faster_rcnn_pytorch_multimodal_tpu.utils.kitti_utils import (
    Calibration,
    Object3d,
    camera_box_to_velo,
)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def _make_waymo_tree(root, n_frames=3):
    base = os.path.join(root, "waymo", "train")
    os.makedirs(os.path.join(base, "point_clouds"))
    os.makedirs(os.path.join(base, "labels"))
    rng = np.random.RandomState(0)
    labels = []
    for i in range(n_frames):
        stem = f"{i:07d}"
        pts = np.hstack(
            [
                rng.uniform(0, 70, (500, 1)),
                rng.uniform(-40, 40, (500, 1)),
                rng.uniform(-2.5, 2.5, (500, 1)),
                rng.uniform(0, 1, (500, 2)),
            ]
        ).astype(np.float32)
        np.save(os.path.join(base, "point_clouds", stem + ".npy"), pts)
        labels.append(
            {
                "assoc_frame": stem,
                "id": [f"trk{i}a", f"trk{i}b"],
                "scene_type": [{"tod": "Day", "weather": "sunny"}],
                "calibration": [{"extrinsic_transform": [[1, 0, 0, 0]]}],
                "box": [
                    {"xc": 20.0 + i, "yc": 0.0, "zc": 0.5, "lx": 4.5, "wy": 2.0,
                     "hz": 1.6, "heading": 0.1},
                    {"xc": 30.0, "yc": 5.0, "zc": 0.4, "lx": 4.0, "wy": 1.9,
                     "hz": 1.5, "heading": -0.2},
                ],
                "class": [1, 2],  # vehicle, pedestrian (-> skipped)
                "difficulty": [0, 0],
                "meta": [
                    {"pts": 100, "avg_intensity": 0.4, "avg_elongation": 0.1,
                     "return_ratio": 0.9},
                    {"pts": 3, "avg_intensity": 0.2, "avg_elongation": 0.0,
                     "return_ratio": 0.8},
                ],
            }
        )
    with open(os.path.join(base, "labels", "lidar_labels.json"), "w") as f:
        json.dump(labels, f)
    return root


_KITTI_CALIB = """P0: 700 0 600 0 0 700 180 0 0 0 1 0
P1: 700 0 600 0 0 700 180 0 0 0 1 0
P2: 700 0 600 0 0 700 180 0 0 0 1 0
P3: 700 0 600 0 0 700 180 0 0 0 1 0
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0
Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0
"""


def _make_kitti_tree(root, n_frames=2):
    base = os.path.join(root, "kitti", "training")
    for sub in ("velodyne", "label_2", "calib", "image_2"):
        os.makedirs(os.path.join(base, sub))
    os.makedirs(os.path.join(root, "kitti", "splits"))
    rng = np.random.RandomState(1)
    ids = []
    for i in range(n_frames):
        idx = f"{i:06d}"
        ids.append(idx)
        pts = np.hstack(
            [
                rng.uniform(0, 60, (400, 1)),
                rng.uniform(-30, 30, (400, 1)),
                rng.uniform(-2, 1, (400, 1)),
                rng.uniform(0, 1, (400, 1)),
            ]
        ).astype(np.float32)
        pts.tofile(os.path.join(base, "velodyne", idx + ".bin"))
        # camera-frame box at z(depth)=20, x=1 -> velo x=20, y=-1
        with open(os.path.join(base, "label_2", idx + ".txt"), "w") as f:
            f.write("Car 0.0 0 1.57 300 150 420 260 1.6 1.8 4.2 1.0 1.6 20.0 1.57\n")
            f.write("Pedestrian 0.0 0 0 100 100 140 220 1.7 0.6 0.8 -5 1.6 15 0\n")
            f.write("DontCare -1 -1 -10 500 160 550 200 -1 -1 -1 -1000 -1000 -1000 -10\n")
        with open(os.path.join(base, "calib", idx + ".txt"), "w") as f:
            f.write(_KITTI_CALIB)
    with open(os.path.join(root, "kitti", "splits", "train.txt"), "w") as f:
        f.write("\n".join(ids))
    return root


# ---------------------------------------------------------------------------
# waymo
# ---------------------------------------------------------------------------


def _lidar_cfg(root):
    return cfg_from_list(
        default_config(),
        ("NET_TYPE", "lidar", "DATA_DIR", str(root), "CACHE_DIR",
         os.path.join(str(root), "cache")),
    )


def test_waymo_roidb_and_frame(tmp_path):
    root = _make_waymo_tree(str(tmp_path))
    cfg = _lidar_cfg(root)
    db = get_db("waymo", cfg, "train")
    assert len(db) == 3
    entry = db.roidb[0]
    # pedestrian remapped away: only the vehicle survives
    assert entry["boxes"].shape == (1, 7)
    assert entry["gt_classes"].tolist() == [1]
    assert entry["difficulty"].tolist() == [1]  # 100 pts, diff 0 -> L1

    f = db.frame(0, augment=False)
    assert f["points"].shape[1] == 5
    # gt converted to voxel grid: xc 20m -> 200 cells at 0.1m voxels
    np.testing.assert_allclose(f["gt_boxes"][0, 0], 200.0, rtol=1e-5)
    np.testing.assert_allclose(f["gt_boxes"][0, 3], 45.0, rtol=1e-5)  # l=4.5m
    np.testing.assert_allclose(f["gt_boxes"][0, 7], 1.0)  # class

    # roidb cache round-trip
    db2 = get_db("waymo", cfg, "train")
    assert len(db2.roidb) == 3


def test_waymo_tod_filter(tmp_path):
    root = _make_waymo_tree(str(tmp_path))
    cfg = cfg_from_list(_lidar_cfg(root), ("TRAIN.TOD_FILTER_LIST", "('Night',)"))
    db = get_db("waymo", cfg, "train")
    assert len(db.roidb) == 0  # all fixture frames are Day


def test_waymo_loader_batch(tmp_path):
    from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader

    root = _make_waymo_tree(str(tmp_path))
    cfg = cfg_from_list(
        _lidar_cfg(root),
        ("STATIC.MAX_POINTS", "1024", "STATIC.MAX_GT", "8",
         "LIDAR.VOXEL_LEN", "0.5"),
    )
    loader = BatchLoader(get_db("waymo", cfg, "train"), cfg, batch_size=2, seed=0)
    batch = loader.next()
    assert batch["data"].shape == (2, 160, 140, 15)  # 80/0.5 x 70/0.5 x 12+3
    assert batch["gt_boxes"].shape == (2, 8, 8)
    assert batch["gt_mask"].any()


def test_unknown_db_raises(tmp_path):
    cfg = _lidar_cfg(str(tmp_path))
    with pytest.raises(KeyError, match="available"):
        get_db("imaginary", cfg, "train")


# ---------------------------------------------------------------------------
# kitti
# ---------------------------------------------------------------------------


def test_kitti_calibration_roundtrip(tmp_path):
    root = _make_kitti_tree(str(tmp_path))
    calib = Calibration(os.path.join(root, "kitti", "training", "calib", "000000.txt"))
    velo = np.array([[20.0, -1.0, -0.5]])
    rect = calib.project_velo_to_rect(velo)
    # velo->cam: x_cam = -y_v = 1, y_cam = -z_v = 0.5, z_cam = x_v = 20
    np.testing.assert_allclose(rect[0], [1.0, 0.5, 20.0], atol=1e-6)
    back = calib.project_rect_to_velo(rect)
    np.testing.assert_allclose(back, velo, atol=1e-6)
    uv = calib.project_rect_to_image(rect)
    np.testing.assert_allclose(uv[0, 0], 700 * 1.0 / 20.0 + 600, atol=1e-4)


def test_kitti_camera_box_to_velo():
    obj = Object3d("Car 0.0 0 1.57 300 150 420 260 1.6 1.8 4.2 1.0 1.6 20.0 1.57")
    calib = Calibration(None, from_dict={
        "P2": np.array([700, 0, 600, 0, 0, 700, 180, 0, 0, 0, 1, 0], float),
        "R0_rect": np.eye(3).ravel(),
        "Tr_velo_to_cam": np.array([0, -1, 0, 0, 0, 0, -1, 0, 1, 0, 0, 0], float),
    })
    b = camera_box_to_velo(obj, calib)
    # rect bottom-center (1, 1.6, 20) -> center (1, 0.8, 20) -> velo (20, -1, -0.8)
    np.testing.assert_allclose(b[:3], [20.0, -1.0, -0.8], atol=1e-5)
    np.testing.assert_allclose(b[3:6], [4.2, 1.8, 1.6], atol=1e-6)  # l w h
    np.testing.assert_allclose(b[6], -np.pi, atol=1e-2)  # -1.57 - pi/2 wrapped


def test_kitti_roidb_and_frame(tmp_path):
    root = _make_kitti_tree(str(tmp_path))
    cfg = _lidar_cfg(root)
    db = get_db("kitti", cfg, "train")
    assert len(db) == 2
    entry = db.roidb[0]
    assert entry["boxes"].shape == (1, 7)  # pedestrian + dontcare skipped
    assert entry["difficulty"].tolist() == [0]  # h=110px, occ 0, trunc 0
    f = db.frame(0, augment=False)
    assert f["points"].shape[1] == 5  # elongation channel padded
    assert f["gt_boxes"].shape == (1, 8)


# ---------------------------------------------------------------------------
# augmentation invariants
# ---------------------------------------------------------------------------


def test_lidar_flip_y_consistency():
    cfg = cfg_from_list(default_config(), ("LIDAR.EN_AUG_GAUSS_DISTORT", "False",
                                           "LIDAR.EN_AUG_DROPOUT", "False",
                                           "LIDAR.EN_AUG_SWAP_X_Y", "False"))
    pts = np.array([[10.0, 5.0, 0.0, 0.5, 0.1]])
    boxes = np.array([[10.0, 5.0, 0.0, 4.0, 2.0, 1.5, 0.3]])
    ignore = np.zeros(1, bool)
    # force both flips by scanning seeds until flip_y happens without flip_x
    for seed in range(50):
        rng = np.random.RandomState(seed)
        p, b, _ = aug.augment_lidar_frame(pts, boxes, ignore, cfg, rng)
        if p[0, 1] == -5.0 and p[0, 0] == 10.0:
            np.testing.assert_allclose(b[0, 1], -5.0)
            np.testing.assert_allclose(b[0, 6], -0.3)
            # point and box stay coincident after the flip
            np.testing.assert_allclose(p[0, :2], b[0, :2])
            return
    pytest.skip("flip_y-only draw not hit in 50 seeds")


def test_rain_sim_attenuates():
    rng = np.random.RandomState(0)
    pts = np.hstack([
        np.random.RandomState(1).uniform(5, 60, (1000, 3)),
        np.ones((1000, 1)), np.zeros((1000, 1)),
    ]).astype(np.float32)
    out = aug.rain_sim(pts, rain_rate=8.0, lidar_max_range=80.0, rng=rng)
    assert len(out) < len(pts)  # some returns lost
    assert out[:, 3].max() < 1.0  # intensity attenuated
