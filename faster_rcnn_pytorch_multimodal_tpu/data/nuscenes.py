"""nuScenes 2D image dataset layer (devkit-free).

The reference builds its nuScenes imdb through the nuscenes-devkit and
projects 3D annotations into CAM_FRONT 2D boxes
(ref lib/datasets/nuscenes_imdb.py:39-523, _anno_to_2d_bbox:254).  This
implementation reads the v1.0 JSON tables directly (sample, sample_data,
sample_annotation, calibrated_sensor, ego_pose, category, attribute) and
performs the same projection chain:

  global box -> ego frame (sample ego_pose) -> sensor frame
  (calibrated_sensor) -> image plane (camera_intrinsic), clipped, with
  behind-camera and out-of-frame boxes dropped.

Layout: <data_dir>/nuscenes/{v1.0-trainval|v1.0-mini}/*.json + samples/.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import Config
from faster_rcnn_pytorch_multimodal_tpu.data.datasets import register
from faster_rcnn_pytorch_multimodal_tpu.data.db_base import DetectionDB

# nuScenes detection classes -> our training classes (vehicle focus,
# matching the reference's car/pedestrian/bicycle selection,
# ref nuscenes_imdb.py class list)
_CLASS_MAP = {
    "vehicle.car": "car",
}


def _quat_to_rot(q) -> np.ndarray:
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def _box_corners(center, wlh, rot: np.ndarray) -> np.ndarray:
    """(8, 3) corners of a nuScenes box (w, l, h ordering)."""
    w, l, h = wlh
    x = l / 2 * np.array([1, 1, 1, 1, -1, -1, -1, -1])
    y = w / 2 * np.array([1, -1, -1, 1, 1, -1, -1, 1])
    z = h / 2 * np.array([1, 1, -1, -1, 1, 1, -1, -1])
    pts = rot @ np.vstack([x, y, z])
    return (pts + np.asarray(center)[:, None]).T


class NuScenesDB(DetectionDB):
    _classes = ("dontcare", "car")

    def __init__(self, cfg: Config, mode: str, version: Optional[str] = None):
        super().__init__("nuscenes", cfg, mode)
        self._root = os.path.join(cfg.data_dir, "nuscenes")
        if version is None:
            for v in ("v1.0-trainval", "v1.0-mini", "v1.0-test"):
                if os.path.isdir(os.path.join(self._root, v)):
                    version = v
                    break
        if version is None or not os.path.isdir(os.path.join(self._root, version)):
            raise FileNotFoundError(f"nuscenes tables not found under {self._root}")
        self._version = version

    def _table(self, name: str) -> List[Dict]:
        with open(os.path.join(self._root, self._version, f"{name}.json")) as f:
            return json.load(f)

    def _build_roidb(self, mode: str) -> List[Dict]:
        samples = self._table("sample")
        sample_data = self._table("sample_data")
        anns = self._table("sample_annotation")
        calib = {c["token"]: c for c in self._table("calibrated_sensor")}
        poses = {p["token"]: p for p in self._table("ego_pose")}
        sensors = {s["token"]: s for s in self._table("sensor")}

        # CAM_FRONT keyframe per sample
        cam_by_sample: Dict[str, Dict] = {}
        for sd in sample_data:
            if not sd.get("is_key_frame"):
                continue
            sensor = sensors.get(calib[sd["calibrated_sensor_token"]]["sensor_token"])
            if sensor and sensor["channel"] == "CAM_FRONT":
                cam_by_sample[sd["sample_token"]] = sd

        anns_by_sample: Dict[str, List[Dict]] = {}
        for a in anns:
            anns_by_sample.setdefault(a["sample_token"], []).append(a)

        roidb = []
        for sample in samples:
            sd = cam_by_sample.get(sample["token"])
            if sd is None:
                continue
            cs = calib[sd["calibrated_sensor_token"]]
            pose = poses[sd["ego_pose_token"]]
            intrinsic = np.asarray(cs["camera_intrinsic"], np.float64)
            w_img, h_img = sd["width"], sd["height"]

            boxes, classes = [], []
            for a in anns_by_sample.get(sample["token"], []):
                cat = _CLASS_MAP.get(a["category_name"])
                if cat is None:
                    continue
                bb = self._project_box(a, pose, cs, intrinsic, w_img, h_img)
                if bb is None:
                    continue
                boxes.append(bb)
                classes.append(self._classes.index(cat))
            if not boxes:
                continue
            roidb.append(
                {
                    "filename": os.path.join(self._root, sd["filename"]),
                    "frame_id": sample["token"],
                    "boxes": np.asarray(boxes, np.float32),
                    "boxes_dc": np.zeros((0, 4), np.float32),
                    "gt_classes": np.asarray(classes, np.int32),
                    "ignore": np.zeros(len(boxes), bool),
                    "difficulty": np.zeros(len(boxes), np.int32),
                    "flipped": False,
                }
            )
        print(f"nuscenes {mode}: {len(roidb)} frames")
        return roidb

    @staticmethod
    def _project_box(ann, pose, cs, intrinsic, w_img, h_img):
        """global 3D ann -> clipped CAM_FRONT 2D box
        (ref nuscenes_imdb.py:_anno_to_2d_bbox:254)."""
        corners = _box_corners(
            ann["translation"], ann["size"], _quat_to_rot(ann["rotation"])
        )
        # global -> ego
        r_e = _quat_to_rot(pose["rotation"])
        corners = (corners - np.asarray(pose["translation"])) @ r_e
        # ego -> sensor
        r_s = _quat_to_rot(cs["rotation"])
        corners = (corners - np.asarray(cs["translation"])) @ r_s
        if (corners[:, 2] < 0.1).all():
            return None  # fully behind the camera
        corners = corners[corners[:, 2] > 0.1]
        uv = corners @ intrinsic.T
        uv = uv[:, :2] / uv[:, 2:3]
        x1, y1 = uv.min(0)
        x2, y2 = uv.max(0)
        x1, x2 = np.clip([x1, x2], 0, w_img - 1)
        y1, y2 = np.clip([y1, y2], 0, h_img - 1)
        if x2 - x1 < 2 or y2 - y1 < 2:
            return None
        return [float(x1), float(y1), float(x2), float(y2)]

    def _load_frame_data(self, entry: Dict) -> np.ndarray:
        import cv2

        return cv2.imread(entry["filename"]).astype(np.float32)

    def evaluate_detections(self, detections_per_class, gt_frames, output_dir: str):
        """VOC-style AP (ref nuscenes_eval.py:104)."""
        from faster_rcnn_pytorch_multimodal_tpu.evaluation.eval_utils import (
            evaluate_class,
        )

        results = {}
        for j in range(1, self.num_classes):
            res = evaluate_class(
                detections_per_class[j], gt_frames, iou_thresh=0.5, eval_type="2d"
            )
            results[self.classes[j]] = res["ap"]
            print(f"{self.classes[j]} AP(2d@0.5) = {res['ap']:.4f}")
        return results


@register("nuscenes")
def _make_nuscenes(db_name: str, cfg: Config, mode: str) -> NuScenesDB:
    return NuScenesDB(cfg, mode)
