"""nuScenes devkit-free loader against a minimal v1.0-style fixture tree."""

import json
import os

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.data.datasets import get_db


def _write(root, name, obj):
    with open(os.path.join(root, f"{name}.json"), "w") as f:
        json.dump(obj, f)


def _make_nusc_tree(root):
    v = os.path.join(root, "nuscenes", "v1.0-mini")
    os.makedirs(v)
    os.makedirs(os.path.join(root, "nuscenes", "samples", "CAM_FRONT"))
    ident = [1.0, 0.0, 0.0, 0.0]
    _write(v, "sensor", [
        {"token": "sen_cam", "channel": "CAM_FRONT", "modality": "camera"},
    ])
    _write(v, "calibrated_sensor", [
        {"token": "cs1", "sensor_token": "sen_cam",
         "translation": [0.0, 0.0, 0.0], "rotation": ident,
         "camera_intrinsic": [[500, 0, 800], [0, 500, 450], [0, 0, 1]]},
    ])
    _write(v, "ego_pose", [
        {"token": "ep1", "translation": [0.0, 0.0, 0.0], "rotation": ident},
    ])
    _write(v, "sample", [{"token": "s1", "scene_token": "sc1"}])
    _write(v, "sample_data", [
        {"token": "sd1", "sample_token": "s1", "calibrated_sensor_token": "cs1",
         "ego_pose_token": "ep1", "is_key_frame": True, "width": 1600,
         "height": 900, "filename": "samples/CAM_FRONT/f1.jpg"},
    ])
    # box 10 m in front (identity pose: sensor z-axis = global z... the
    # fixture uses identity rotations so "forward" is +z in sensor frame)
    _write(v, "sample_annotation", [
        {"token": "a1", "sample_token": "s1", "category_name": "vehicle.car",
         "translation": [0.0, 0.0, 10.0], "size": [2.0, 4.5, 1.6],
         "rotation": ident},
        {"token": "a2", "sample_token": "s1", "category_name": "human.pedestrian.adult",
         "translation": [2.0, 0.0, 12.0], "size": [0.6, 0.6, 1.8],
         "rotation": ident},
        {"token": "a3", "sample_token": "s1", "category_name": "vehicle.car",
         "translation": [0.0, 0.0, -15.0], "size": [2.0, 4.5, 1.6],
         "rotation": ident},  # behind the camera -> dropped
    ])
    return root


def test_nuscenes_projection_and_filtering(tmp_path):
    root = _make_nusc_tree(str(tmp_path))
    cfg = cfg_from_list(
        default_config(),
        ("NET_TYPE", "image", "DATA_DIR", root,
         "CACHE_DIR", os.path.join(root, "cache")),
    )
    db = get_db("nuscenes", cfg, "train")
    assert len(db) == 1
    entry = db.roidb[0]
    # only the in-front car survives (pedestrian not mapped, a3 behind)
    assert entry["boxes"].shape == (1, 4)
    box = entry["boxes"][0]
    # center projects to the principal point (800, 450); the 4.5 m-long box
    # at 10 m with f=500 spans ~112-225 px around it depending on depth
    assert 600 < box[0] < 800 < box[2] < 1000
    assert 300 < box[1] < 450 < box[3] < 600
