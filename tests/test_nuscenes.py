"""nuScenes devkit-free loader against a minimal v1.0-style fixture tree.

Fixture-driven coverage for the full reference pipeline
(ref lib/datasets/nuscenes_imdb.py): projection + canvas clipping,
annotation filters (visibility / num_lidar_pts), category remap
(pedestrian subtypes, emergency vehicles, dontcare fallthrough to dc
regions), little-clip aspect filters, occlusion removal, and the AP
eval round-trip.
"""

import json
import math
import os

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.data.datasets import get_db
from faster_rcnn_pytorch_multimodal_tpu.data.nuscenes import (
    aspect_filtered,
    remap_category,
)

IDENT = [1.0, 0.0, 0.0, 0.0]


def _write(root, name, obj):
    with open(os.path.join(root, f"{name}.json"), "w") as f:
        json.dump(obj, f)


def _ann(token, cat, translation, size, rotation=IDENT, vis="4", pts=10):
    return {
        "token": token, "sample_token": "s1", "category_name": cat,
        "translation": translation, "size": size, "rotation": rotation,
        "visibility_token": vis, "num_lidar_pts": pts,
    }


def _make_nusc_tree(root, annotations):
    v = os.path.join(root, "nuscenes", "v1.0-mini")
    os.makedirs(v)
    os.makedirs(os.path.join(root, "nuscenes", "samples", "CAM_FRONT"))
    _write(v, "sensor", [
        {"token": "sen_cam", "channel": "CAM_FRONT", "modality": "camera"},
    ])
    _write(v, "calibrated_sensor", [
        {"token": "cs1", "sensor_token": "sen_cam",
         "translation": [0.0, 0.0, 0.0], "rotation": IDENT,
         "camera_intrinsic": [[500, 0, 800], [0, 500, 450], [0, 0, 1]]},
    ])
    _write(v, "ego_pose", [
        {"token": "ep1", "translation": [0.0, 0.0, 0.0], "rotation": IDENT},
    ])
    _write(v, "sample", [{"token": "s1", "scene_token": "sc1"}])
    _write(v, "sample_data", [
        {"token": "sd1", "sample_token": "s1", "calibrated_sensor_token": "cs1",
         "ego_pose_token": "ep1", "is_key_frame": True, "width": 1600,
         "height": 900, "filename": "samples/CAM_FRONT/f1.jpg"},
    ])
    _write(v, "sample_annotation", annotations)
    return root


def _db(root, mode="train"):
    cfg = cfg_from_list(
        default_config(),
        ("NET_TYPE", "image", "DATA_DIR", root,
         "CACHE_DIR", os.path.join(root, "cache")),
    )
    return get_db("nuscenes", cfg, mode)


def test_projection_and_behind_camera(tmp_path):
    """The identity-pose fixture places the optical axis along +z; a box
    10 m out projects around the principal point, a box behind the camera
    is dropped, and a pedestrian subtype maps to human.pedestrian
    (3 fg classes, ref nuscenes_imdb.py:55-59)."""
    root = _make_nusc_tree(str(tmp_path), [
        _ann("a1", "vehicle.car", [0.0, 0.0, 10.0], [2.0, 4.5, 1.6]),
        _ann("a2", "human.pedestrian.adult", [6.0, 0.0, 12.0], [0.6, 0.6, 1.8]),
        _ann("a3", "vehicle.car", [0.0, 0.0, -15.0], [2.0, 4.5, 1.6]),
    ])
    db = _db(root)
    assert db.classes == (
        "dontcare", "vehicle.car", "human.pedestrian", "vehicle.bicycle"
    )
    assert len(db) == 1
    entry = db.roidb[0]
    assert entry["boxes"].shape == (2, 4)
    assert list(entry["gt_classes"]) == [1, 2]
    box = entry["boxes"][0]
    # center projects to the principal point (800, 450); the 4.5 m-long box
    # at 10 m with f=500 spans ~112-225 px around it depending on depth
    assert 600 < box[0] < 800 < box[2] < 1000
    assert 300 < box[1] < 450 < box[3] < 600


def test_category_remap_units():
    """ref nuscenes_imdb.py:364-377."""
    assert remap_category("human.pedestrian.adult") == "human.pedestrian"
    assert remap_category("human.pedestrian.child") == "human.pedestrian"
    assert remap_category("human.pedestrian.construction_worker") == "human.pedestrian"
    assert remap_category("human.pedestrian.police_officer") == "human.pedestrian"
    # wheelchair is NOT in the reference's explicit subtype list
    assert remap_category("human.pedestrian.wheelchair") == "dontcare"
    assert remap_category("vehicle.emergency.ambulance") == "vehicle.car"
    assert remap_category("vehicle.emergency.police") == "vehicle.car"
    assert remap_category("vehicle.car") == "vehicle.car"
    assert remap_category("vehicle.bicycle") == "vehicle.bicycle"
    assert remap_category("movable_object.barrier") == "dontcare"


def test_annotation_filters_and_dc(tmp_path):
    """visibility <= 1 and num_lidar_pts < 1 drop the annotation entirely
    (ref :355-357); unmapped categories become dc regions, not GT."""
    root = _make_nusc_tree(str(tmp_path), [
        _ann("a1", "vehicle.car", [0.0, 0.0, 10.0], [2.0, 4.5, 1.6]),
        _ann("a2", "vehicle.car", [3.0, 0.0, 10.0], [2.0, 4.5, 1.6], vis="1"),
        _ann("a3", "vehicle.car", [-3.0, 0.0, 10.0], [2.0, 4.5, 1.6], pts=0),
        _ann("a4", "movable_object.barrier", [1.0, 1.0, 8.0], [2.0, 2.0, 1.0]),
    ])
    db = _db(root)
    entry = db.roidb[0]
    assert entry["boxes"].shape == (1, 4)  # a2/a3 filtered, a4 -> dc
    assert entry["boxes_dc"].shape == (1, 4)


def test_aspect_little_clip_filter(tmp_path):
    """ref :385-392: narrow+tall car boxes are dropped (min_thresh_car=40,
    aspect > 2), as is anything with aspect > 5."""
    assert aspect_filtered("vehicle.car", 0, 0, 30, 70)      # w<40, ar>2
    assert aspect_filtered("vehicle.car", 0, 0, 100, 400)    # ar>3.5
    assert not aspect_filtered("vehicle.car", 0, 0, 100, 200)
    assert aspect_filtered("vehicle.bicycle", 0, 0, 15, 40)  # w<20, ar>2
    assert not aspect_filtered("vehicle.bicycle", 0, 0, 30, 50)
    assert aspect_filtered("human.pedestrian", 0, 0, 10, 60)  # ar>5

    # integration: a sliver car (tall+narrow in image space) is removed
    root = _make_nusc_tree(str(tmp_path), [
        _ann("a1", "vehicle.car", [0.0, 0.0, 10.0], [2.0, 4.5, 1.6]),
        # 0.5 m wide, 8 m tall at 40 m -> ~6 px wide, ~100 px tall
        _ann("a2", "vehicle.car", [5.0, 0.0, 40.0], [0.5, 0.5, 8.0]),
    ])
    db = _db(root)
    assert db.roidb[0]["boxes"].shape == (1, 4)


def test_occlusion_removal(tmp_path):
    """ref :419-452: a GT fully inside the projection of a >0.3 m nearer
    GT is removed (the big near car hides the small far one)."""
    root = _make_nusc_tree(str(tmp_path), [
        _ann("near", "vehicle.car", [0.0, 0.0, 8.0], [3.0, 5.0, 2.5]),
        # same bearing, much farther and smaller -> projects fully inside
        _ann("far", "vehicle.car", [0.0, 0.0, 30.0], [1.8, 4.0, 1.5]),
    ])
    db = _db(root)
    assert db.roidb[0]["boxes"].shape == (1, 4)
    # the survivor is the near one (bigger on screen)
    b = db.roidb[0]["boxes"][0]
    assert (b[2] - b[0]) > 150


def test_rotated_box_projection(tmp_path):
    """A 90-degree-yawed box swaps its image-plane extent: the 4.5 m
    length turns into depth, leaving the 2.0 m width across the image."""
    half = math.sqrt(0.5)
    root = _make_nusc_tree(str(tmp_path), [
        _ann("a1", "vehicle.car", [6.0, 0.0, 30.0], [2.0, 4.5, 1.6]),
        _ann("a2", "vehicle.car", [0.0, 0.0, 30.0], [2.0, 4.5, 1.6],
             rotation=[half, 0.0, half, 0.0]),  # 90 deg about the y axis
    ])
    db = _db(root)
    b1, b2 = db.roidb[0]["boxes"]
    # axis-aligned: 4.5 m across at ~10 m -> wide; rotated: 2.0 m across
    w1 = b1[2] - b1[0]
    w2 = b2[2] - b2[0]
    assert w1 > w2 * 1.5, (w1, w2)


def test_eval_round_trip(tmp_path):
    """Perfect detections -> AP 1.0 per class through evaluate_detections
    (the greedy evaluate_class matcher)."""
    root = _make_nusc_tree(str(tmp_path), [
        _ann("a1", "vehicle.car", [0.0, 0.0, 10.0], [2.0, 4.5, 1.6]),
        _ann("a2", "human.pedestrian.adult", [6.0, 0.0, 12.0], [0.6, 0.6, 1.8]),
    ])
    db = _db(root)
    entry = db.roidb[0]
    fid = entry["frame_id"]
    dets = {j: [] for j in range(1, db.num_classes)}
    gts = {}
    for j in range(1, db.num_classes):
        sel = entry["gt_classes"] == j
        gts_j = entry["boxes"][sel]
        gts[fid] = gts.get(fid, {"boxes": np.zeros((0, 4))})
    for j in range(1, db.num_classes):
        sel = entry["gt_classes"] == j
        for b in entry["boxes"][sel]:
            dets[j].append({"frame_id": fid, "bbox": b.copy(), "confidence": 0.9})
    # per-class gt dict, as test_net builds it
    from faster_rcnn_pytorch_multimodal_tpu.evaluation.eval_utils import (
        evaluate_class,
    )

    for j in (1, 2):
        sel = entry["gt_classes"] == j
        res = evaluate_class(
            dets[j], {fid: {"boxes": entry["boxes"][sel]}},
            iou_thresh=0.5, eval_type="2d",
        )
        assert res["ap"] == 1.0, (j, res)
    # bicycle class: no dets, no gt -> ap 0 without crashing
    res = evaluate_class([], {fid: {"boxes": np.zeros((0, 4))}},
                         iou_thresh=0.5, eval_type="2d")
    assert res["ap"] == 0.0


def test_val_mode_keeps_empty_frames(tmp_path):
    """remove_without_gt applies to train only: a frame whose every
    annotation is filtered still evaluates in val (advisor r2 fix)."""
    root = _make_nusc_tree(str(tmp_path), [
        _ann("a1", "vehicle.car", [0.0, 0.0, 10.0], [2.0, 4.5, 1.6], vis="1"),
    ])
    assert len(_db(root, "val")) == 1
    import shutil

    shutil.rmtree(os.path.join(root, "cache"), ignore_errors=True)
    assert len(_db(os.path.join(root), "train")) == 0
