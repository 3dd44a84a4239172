"""Host-side augmentation (numpy), mirroring the reference's minibatch
transforms (ref lib/roi_data_layer/minibatch.py:295-425, 563-676).

LiDAR augmentations operate on RAW points (meters) + 7-DoF boxes BEFORE the
on-device voxelization; image augmentations on HWC uint8/float arrays +
x1y1x2y2 boxes.  Probabilities and formulas match the reference, including
its quirks (swap_x_y does NOT swap l/w — ref :360-377 has those lines
commented out; flips negate ry).

The reference's physics-based rain simulation (test-time sensor fault
injection, ref :397-425) is kept as a product feature.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import Config


def rotate_points_along_z(points: np.ndarray, angle: float) -> np.ndarray:
    """(N, 3+C) points rotated by `angle` around +z (ref minibatch.py:695-713)."""
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]], dtype=points.dtype)
    out = points.copy()
    out[:, :3] = points[:, :3] @ rot
    return out


def augment_lidar_frame(
    points: np.ndarray,
    boxes: np.ndarray,
    ignore: np.ndarray,
    cfg: Config,
    rng: np.random.RandomState,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Training-time LiDAR augmentation (ref minibatch.py:295-395).

    points: (P, 3+C) meters; boxes: (G, 7) [xc,yc,zc,l,w,h,ry] meters;
    ignore: (G,) bool (set True for boxes pushed out of range).
    Returns (points, boxes, ignore) — copies, inputs untouched.
    """
    lc = cfg.lidar
    points = points.copy()
    boxes = boxes.copy()
    ignore = ignore.copy()

    flip_y = lc.en_aug_flips and rng.choice([True, False], p=[0.5, 0.5])
    flip_x = lc.en_aug_flips and rng.choice([True, False], p=[0.5, 0.5])
    gauss = lc.en_aug_gauss_distort and rng.choice([True, False], p=[0.3, 0.7])
    dropout = lc.en_aug_dropout and rng.choice([True, False], p=[0.3, 0.7])
    rotate = lc.en_aug_rotate and rng.choice([True, False], p=[0.3, 0.7])
    swap = lc.en_aug_swap_x_y and rng.choice([True, False], p=[0.3, 0.7])

    if gauss:  # ref :310-321
        for axis, hi in ((0, 0.07), (1, 0.07), (2, 0.05)):
            sigma = rng.uniform(0.0, hi)
            points[:, axis] += rng.normal(0, sigma, size=len(points))

    if dropout:  # ref :323-327
        p_keep = rng.uniform(0.8, 1.0)
        points = points[p_keep > rng.rand(len(points))]

    if rotate:  # ref :337-352
        ang = rng.uniform(-np.pi / 2, np.pi / 2)
        points = rotate_points_along_z(points, ang)
        if len(boxes):
            boxes[:, :3] = rotate_points_along_z(boxes[:, :3], ang)
            boxes[:, 6] += ang
            ignore |= ~_in_range(boxes, lc)

    if swap:  # ref :354-377 — note l/w deliberately NOT swapped
        x_mean = (lc.x_range[1] - lc.x_range[0]) / 2.0
        bx, by = boxes[:, 0].copy(), boxes[:, 1].copy()
        boxes[:, 0] = by - lc.y_range[0]
        boxes[:, 1] = bx - x_mean
        boxes[:, 6] = -boxes[:, 6] + np.pi / 2.0
        px, py = points[:, 0].copy(), points[:, 1].copy()
        points[:, 0] = py - lc.y_range[0]
        points[:, 1] = px - x_mean
        if len(boxes):
            ignore |= ~_in_range(boxes, lc)

    if flip_y:  # ref :379-388
        points[:, 1] = -points[:, 1]
        y_mean = (lc.y_range[0] + lc.y_range[1]) / 2.0
        boxes[:, 1] = -(boxes[:, 1] - y_mean) + y_mean
        boxes[:, 6] = -boxes[:, 6]

    if flip_x:  # ref :390-395
        points[:, 0] = -points[:, 0] + lc.x_range[1]
        x_mean = (lc.x_range[0] + lc.x_range[1]) / 2.0
        boxes[:, 0] = -(boxes[:, 0] - x_mean) + x_mean
        boxes[:, 6] = -boxes[:, 6]

    return points, boxes, ignore


def _in_range(boxes: np.ndarray, lc) -> np.ndarray:
    return (
        (boxes[:, 0] >= lc.x_range[0]) & (boxes[:, 0] < lc.x_range[1])
        & (boxes[:, 1] >= lc.y_range[0]) & (boxes[:, 1] < lc.y_range[1])
        & (boxes[:, 2] >= lc.z_range[0]) & (boxes[:, 2] < lc.z_range[1])
    )


def rain_sim(
    points: np.ndarray,
    rain_rate: float,
    lidar_max_range: float,
    rng: np.random.RandomState,
) -> np.ndarray:
    """Test-time physics-based rain attenuation (ref minibatch.py:397-421):
    gaussian range noise growing with distance, intensity attenuation
    exp(-2*alpha*R^beta*z), and removal of returns whose received power
    falls below the max-range noise floor."""
    points = points.copy()
    z = np.sqrt(np.sum(points[:, 0:3] ** 2, axis=1))
    rho = 0.9 / np.pi
    big_r = rain_rate**0.6
    p_min = rho / (np.pi * lidar_max_range**2)
    sigma = 0.02 * z * (1 - np.exp(-rain_rate)) ** 2
    shift = rng.normal(np.zeros_like(sigma), sigma)
    z = z + shift
    points[:, 0:3] += np.repeat(shift[:, None], 3, axis=1) / 3.0
    delta = np.exp(-2 * 0.01 * big_r * z)
    p_n = (rho / (z * z + np.finfo(np.float64).eps)) * delta
    points[:, 3] = points[:, 3] * delta
    return points[p_n >= p_min]


def test_dropout(points: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Test-time fixed 20% point dropout (ref minibatch.py:422-425)."""
    return points[0.8 > rng.rand(len(points))]


def flip_image_boxes(
    image: np.ndarray, boxes: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Horizontal flip (ref minibatch.py USE_FLIPPED path)."""
    w = image.shape[1]
    out = boxes.copy()
    out[:, 0] = w - 1 - boxes[:, 2]
    out[:, 2] = w - 1 - boxes[:, 0]
    return image[:, ::-1].copy(), out


def photometric_distort(
    image: np.ndarray, rng: np.random.RandomState
) -> np.ndarray:
    """Lightweight photometric jitter standing in for the reference's
    imgaug pipeline (blur/noise/HSV shifts, ref minibatch.py:563-597):
    brightness, contrast, per-channel gain, gaussian noise."""
    img = image.astype(np.float32)
    if rng.rand() < 0.5:
        img = img + rng.uniform(-16, 16)
    if rng.rand() < 0.5:
        img = (img - img.mean()) * rng.uniform(0.8, 1.2) + img.mean()
    if rng.rand() < 0.3:
        img = img * rng.uniform(0.9, 1.1, size=(1, 1, img.shape[2]))
    if rng.rand() < 0.3:
        img = img + rng.normal(0, 4, img.shape)
    return np.clip(img, 0, 255)


def get_fov_flag(pts_rect: np.ndarray, img_size, calib=None) -> np.ndarray:
    """Keep points projecting inside the camera image
    (ref minibatch.py:678-693).  img_size = (H, W)."""
    if calib is not None:
        pts_img, pts_depth = calib.rect_to_img(pts_rect)
        flag = (
            (pts_img[:, 0] >= 0) & (pts_img[:, 0] < img_size[1])
            & (pts_img[:, 1] >= 0) & (pts_img[:, 1] < img_size[0])
        )
        return flag & (pts_depth >= 0)
    return pts_rect[:, 2] >= 0
