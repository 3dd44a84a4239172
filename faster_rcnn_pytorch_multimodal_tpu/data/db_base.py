"""Dataset base class (re-design of ref lib/datasets/db.py:23-452).

Provides: roidb lazy-load + pickle caching, train/val index handling, the
loader-facing `frame(i, augment)` protocol (raw points or image + GT in the
spaces the model expects), results-file writers (image 5-col / lidar 8-col
with trailing uncertainty columns, ref db.py:305-367), and
evaluate_detections dispatch.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import Config
from faster_rcnn_pytorch_multimodal_tpu.data import augment as aug

UC_KEYS = (
    "a_bbox_var",
    "a_cls_entropy",
    "a_cls_var",
    "a_cls_mutual_info",
    "e_bbox_var",
    "e_cls_entropy",
    "e_cls_mutual_info",
)


class DetectionDB:
    """Base for real datasets.  Subclasses set `_classes`, implement
    `_build_roidb(mode)` and `_load_frame_data(entry)`."""

    type = "lidar"  # or 'image'

    def __init__(self, name: str, cfg: Config, mode: str):
        self.name = f"{name}_{cfg.net_type}_{mode}"
        self._db_name = name
        self.cfg = cfg
        self.mode = mode
        self._roidb: Optional[List[Dict]] = None
        self._rng = np.random.RandomState(cfg.rng_seed)

    # -- identity -------------------------------------------------------

    @property
    def classes(self):
        return self._classes

    @property
    def num_classes(self) -> int:
        return len(self._classes)

    def __len__(self) -> int:
        return len(self.roidb)

    # -- roidb cache (ref db.py:62-83, waymo_lidb.py:116-159) ---------------

    def _cache_dir(self) -> str:
        d = self.cfg.cache_dir or os.path.join(self.cfg.data_dir, "cache")
        os.makedirs(d, exist_ok=True)
        return d

    @property
    def roidb(self) -> List[Dict]:
        if self._roidb is None:
            cache = os.path.join(
                self._cache_dir(),
                f"{self._db_name}_{self.mode}_{self.cfg.net_type}_gt_roidb.pkl",
            )
            if os.path.exists(cache):
                with open(cache, "rb") as f:
                    self._roidb = pickle.load(f)
                print(f"{self._db_name} gt roidb loaded from {cache}")
            else:
                self._roidb = self._build_roidb(self.mode)
                with open(cache, "wb") as f:
                    pickle.dump(self._roidb, f, pickle.HIGHEST_PROTOCOL)
                print(f"wrote gt roidb to {cache}")
        return self._roidb

    # -- loader protocol --------------------------------------------------

    def frame(self, index: int, augment: bool = False) -> Dict[str, np.ndarray]:
        entry = self.roidb[index]
        if self.cfg.net_type == "lidar":
            return self._lidar_frame(entry, augment)
        return self._image_frame(entry, augment)

    def _lidar_frame(self, entry: Dict, augment: bool) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        points = self._load_frame_data(entry)  # (P, >=4) meters
        if points.shape[1] == 4:  # pad elongation channel (non-Waymo)
            points = np.hstack([points, np.zeros((len(points), 1), np.float32)])
        boxes = entry["boxes"].astype(np.float32).copy()  # (G, 7) meters
        classes = entry["gt_classes"].astype(np.float32)
        ignore = entry.get("ignore", np.zeros(len(boxes), bool)).copy()

        if augment:
            points, boxes, ignore = aug.augment_lidar_frame(
                points, boxes, ignore, cfg, self._rng
            )
        if self.mode == "test" or self.mode == "val":
            if cfg.test.rain_sim_en:
                points = aug.rain_sim(
                    points,
                    cfg.test.rain_rate,
                    self._lidar_max_range(),
                    self._rng,
                )
            if cfg.test.dropout_en:
                points = aug.test_dropout(points, self._rng)

        keep = ~ignore[: len(boxes)]
        boxes, classes = boxes[keep], classes[keep]

        scale = float(
            cfg.train.scales[0] if self.mode == "train" else cfg.test.scales[0]
        )
        gt_vg = self._boxes_pc_to_voxel_grid(boxes, scale)
        gt = np.hstack([gt_vg, classes[:, None]]).astype(np.float32)

        voxel_len = cfg.lidar.voxel_len / scale
        num_x = int((cfg.lidar.x_range[1] - cfg.lidar.x_range[0]) / voxel_len)
        num_y = int((cfg.lidar.y_range[1] - cfg.lidar.y_range[0]) / voxel_len)
        return {
            "points": points.astype(np.float32),
            "gt_boxes": gt,
            "window": np.array([0, num_x, 0, num_y], np.float32),
            "info": np.array(
                [0, num_x, 0, num_y, 0, cfg.lidar.num_slices, scale], np.float32
            ),
            "filename": entry["filename"],
        }

    def _boxes_pc_to_voxel_grid(self, boxes: np.ndarray, scale: float) -> np.ndarray:
        """ref lib/utils/bbox.py:113-138 (bbox_pc_to_voxel_grid)."""
        cfg = self.cfg
        xr, yr, zr = cfg.lidar.x_range, cfg.lidar.y_range, cfg.lidar.z_range
        voxel_len = cfg.lidar.voxel_len / scale
        sx = 1.0 / voxel_len
        out = boxes.copy()
        if len(out):
            out[:, 0] = (boxes[:, 0] - xr[0]) * sx
            out[:, 1] = (boxes[:, 1] - yr[0]) * sx
            out[:, 2] = boxes[:, 2] - zr[0]
            out[:, 3] = boxes[:, 3] * sx
            out[:, 4] = boxes[:, 4] * sx
        return out

    def boxes_voxel_grid_to_pc(
        self, boxes: np.ndarray, scale: float, aabb: bool = False
    ) -> np.ndarray:
        """Inverse (ref bbox.py:140-162) for writing detections in meters."""
        cfg = self.cfg
        xr, yr, zr = cfg.lidar.x_range, cfg.lidar.y_range, cfg.lidar.z_range
        voxel_len = cfg.lidar.voxel_len / scale
        out = boxes.copy()
        if not len(out):
            return out
        if aabb:
            out[:, 0] = boxes[:, 0] * voxel_len + xr[0]
            out[:, 1] = boxes[:, 1] * voxel_len + yr[0]
            out[:, 2] = boxes[:, 2] * voxel_len + xr[0]
            out[:, 3] = boxes[:, 3] * voxel_len + yr[0]
        else:
            out[:, 0] = boxes[:, 0] * voxel_len + xr[0]
            out[:, 1] = boxes[:, 1] * voxel_len + yr[0]
            out[:, 2] = boxes[:, 2] + zr[0]
            out[:, 3] = boxes[:, 3] * voxel_len
            out[:, 4] = boxes[:, 4] * voxel_len
        return out

    def _image_frame(self, entry: Dict, augment: bool) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        img = self._load_frame_data(entry).astype(np.float32)  # (H, W, 3) BGR
        boxes = entry["boxes"].astype(np.float32).copy()  # (G, 4) x1y1x2y2
        classes = entry["gt_classes"].astype(np.float32)

        if augment:
            if cfg.train.use_flipped and self._rng.rand() < 0.5:
                img, boxes = aug.flip_image_boxes(img, boxes)
            img = aug.photometric_distort(img, self._rng)

        scale = float(
            cfg.train.scales[0] if self.mode == "train" else cfg.test.scales[0]
        )
        if scale != 1.0:
            import cv2

            img = cv2.resize(
                img, None, fx=scale, fy=scale, interpolation=cv2.INTER_LINEAR
            )
            boxes = boxes * scale

        img = (img - np.asarray(cfg.pixel_means, np.float32)) / np.asarray(
            cfg.pixel_stddevs, np.float32
        )
        h, w = img.shape[:2]
        gt = np.hstack([boxes, classes[:, None]]).astype(np.float32)
        return {
            "data": img,
            "gt_boxes": gt,
            "window": np.array([0, w, 0, h], np.float32),
            "filename": entry["filename"],
        }

    # -- results writing (ref db.py:305-367) --------------------------------

    def write_image_results(self, all_boxes, frame_ids, out_dir: str):
        """Per-class text files: frame_id score x1 y1 x2 y2 (5-col + id)."""
        os.makedirs(out_dir, exist_ok=True)
        for j in range(1, self.num_classes):
            path = os.path.join(out_dir, f"det_{self.mode}_{self.classes[j]}.txt")
            with open(path, "w") as f:
                for i, fid in enumerate(frame_ids):
                    for row in np.atleast_2d(all_boxes[j][i]) if len(all_boxes[j][i]) else []:
                        f.write(
                            f"{fid} {row[4]:.6f} {row[0]:.2f} {row[1]:.2f} "
                            f"{row[2]:.2f} {row[3]:.2f}\n"
                        )

    def write_lidar_results(self, all_boxes, frame_ids, out_dir: str, uncertainties=None):
        """Per-class text files: frame_id score xc yc zc l w h ry [uc...]."""
        os.makedirs(out_dir, exist_ok=True)
        for j in range(1, self.num_classes):
            path = os.path.join(out_dir, f"det_{self.mode}_{self.classes[j]}.txt")
            with open(path, "w") as f:
                for i, fid in enumerate(frame_ids):
                    rows = all_boxes[j][i]
                    if not len(rows):
                        continue
                    for r_idx, row in enumerate(np.atleast_2d(rows)):
                        line = (
                            f"{fid} {row[7]:.6f} "
                            + " ".join(f"{v:.3f}" for v in row[:7])
                        )
                        if uncertainties is not None and len(uncertainties[j][i]):
                            for key in UC_KEYS:
                                u = uncertainties[j][i].get(key)
                                if u is not None:
                                    line += " " + " ".join(
                                        f"{v:.5f}" for v in np.atleast_1d(u[r_idx]).ravel()
                                    )
                        f.write(line + "\n")

    # -- subclass hooks ------------------------------------------------------

    def _build_roidb(self, mode: str) -> List[Dict]:
        raise NotImplementedError

    def _load_frame_data(self, entry: Dict) -> np.ndarray:
        raise NotImplementedError

    def _lidar_max_range(self) -> float:
        return 200.0

    def evaluate_detections(self, detections_per_class, gt_frames, output_dir: str):
        raise NotImplementedError
