"""CADC layer: KITTI format + snowfall filtering; converter round trip."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.data.datasets import get_db
from tests.test_datasets import _KITTI_CALIB


def _make_cadc_tree(root, snow_levels=("none", "extreme")):
    base = os.path.join(root, "cadc", "training")
    for sub in ("velodyne", "label_2", "calib"):
        os.makedirs(os.path.join(base, sub))
    os.makedirs(os.path.join(root, "cadc", "splits"))
    rng = np.random.RandomState(0)
    meta = {}
    ids = []
    for i, snow in enumerate(snow_levels):
        idx = f"{i:06d}"
        ids.append(idx)
        pts = np.hstack(
            [
                rng.uniform(0, 60, (300, 1)),
                rng.uniform(-30, 30, (300, 1)),
                rng.uniform(-2, 1, (300, 1)),
                rng.uniform(0, 1, (300, 1)),
            ]
        ).astype(np.float32)
        pts.tofile(os.path.join(base, "velodyne", idx + ".bin"))
        with open(os.path.join(base, "label_2", idx + ".txt"), "w") as f:
            f.write("Car 0.0 0 1.57 300 150 420 260 1.6 1.8 4.2 1.0 1.6 20.0 1.57\n")
        with open(os.path.join(base, "calib", idx + ".txt"), "w") as f:
            f.write(_KITTI_CALIB)
        meta[idx] = snow
    with open(os.path.join(root, "cadc", "splits", "train.txt"), "w") as f:
        f.write("\n".join(ids))
    with open(os.path.join(root, "cadc", "scene_meta.json"), "w") as f:
        json.dump(meta, f)
    return root


def test_cadc_snow_filtering(tmp_path):
    root = _make_cadc_tree(str(tmp_path))
    base = ("NET_TYPE", "lidar", "DATA_DIR", str(root),
            "CACHE_DIR", os.path.join(str(root), "cache_a"))
    cfg = cfg_from_list(default_config(), base)
    db = get_db("cadc", cfg, "train")
    assert len(db) == 2  # all snow levels allowed by default

    cfg2 = cfg_from_list(
        default_config(),
        ("NET_TYPE", "lidar", "DATA_DIR", str(root),
         "CACHE_DIR", os.path.join(str(root), "cache_b"),
         "TRAIN.CADC_FILTER_LIST", "('none',)"),
    )
    db2 = get_db("cadc", cfg2, "train")
    assert len(db2) == 1  # the extreme-snow frame filtered out
    assert db2.roidb[0]["snow_level"] == "none"
    f = db2.frame(0, augment=False)
    assert f["points"].shape[1] == 5
    assert f["gt_boxes"].shape == (1, 8)


def test_cadc_fov_crop_applied(tmp_path):
    """Points behind the camera (x < 0 in velo frame) must be dropped by the
    FOV crop (ref CADC_utils.py:28-48 z-filter)."""
    root = _make_cadc_tree(str(tmp_path), snow_levels=("none",))
    base = os.path.join(root, "cadc", "training")
    idx = "000000"
    pts = np.array(
        [
            [20.0, 0.0, 0.0, 0.5],   # in front of the camera
            [-20.0, 0.0, 0.0, 0.5],  # behind -> must be cropped
            [20.0, 1.0, -0.5, 0.2],
        ],
        np.float32,
    )
    pts.tofile(os.path.join(base, "velodyne", idx + ".bin"))
    cfg = cfg_from_list(
        default_config(),
        ("NET_TYPE", "lidar", "DATA_DIR", str(root),
         "CACHE_DIR", os.path.join(str(root), "cache_fov")),
    )
    db = get_db("cadc", cfg, "train")
    raw = db._load_frame_data(db.roidb[0])
    assert len(raw) == 2
    assert np.all(raw[:, 0] > 0)


def test_cadc_converter_label_roundtrip(tmp_path):
    """cadc_unpack writes a KITTI line whose velo-frame reconstruction via
    camera_box_to_velo recovers the original cuboid."""
    import cadc_unpack_all_kitti as conv

    from faster_rcnn_pytorch_multimodal_tpu.utils.kitti_utils import (
        Calibration,
        Object3d,
        camera_box_to_velo,
    )

    cuboid = {
        "label": "Car",
        "position": {"x": 20.0, "y": -1.0, "z": -0.8},
        "dimensions": {"x": 4.2, "y": 1.8, "z": 1.6},  # l, w, h
        "yaw": 0.4,
    }
    out = os.path.join(str(tmp_path), "000000.txt")
    conv.write_txt_annotation(out, [cuboid])
    with open(out) as f:
        obj = Object3d(f.readline())
    calib = Calibration(None, from_dict={
        "P2": np.array([700, 0, 600, 0, 0, 700, 180, 0, 0, 0, 1, 0], float),
        "R0_rect": np.eye(3).ravel(),
        "Tr_velo_to_cam": np.array([0, -1, 0, 0, 0, 0, -1, 0, 1, 0, 0, 0], float),
    })
    b = camera_box_to_velo(obj, calib)
    np.testing.assert_allclose(b[:3], [20.0, -1.0, -0.8], atol=0.01)
    np.testing.assert_allclose(b[3:6], [4.2, 1.8, 1.6], atol=0.01)
    np.testing.assert_allclose(b[6], 0.4, atol=0.01)
