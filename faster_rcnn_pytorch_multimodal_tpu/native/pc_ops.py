"""ctypes wrapper over native/libpc_ops.so with lazy on-demand build."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpc_ops.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.pc_range_filter.restype = ctypes.c_int
        lib.pc_range_filter.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p]
        lib.pc_gauss_distort.restype = None
        lib.pc_gauss_distort.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_uint64,
        ]
        lib.pc_dropout.restype = ctypes.c_int
        lib.pc_dropout.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_uint64,
        ]
        lib.pc_rotate_z.restype = None
        lib.pc_rotate_z.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float]
        lib.pc_flip_y.restype = None
        lib.pc_flip_y.argtypes = [f32p, ctypes.c_int, ctypes.c_int]
        lib.pc_flip_x.restype = None
        lib.pc_flip_x.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float]
        lib.pc_swap_xy.restype = None
        lib.pc_swap_xy.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ]
        lib.pc_rain_sim.restype = ctypes.c_int
        lib.pc_rain_sim.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_uint64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _prep(points: np.ndarray) -> np.ndarray:
    pts = np.ascontiguousarray(points, dtype=np.float32)
    return pts if pts is not points else pts.copy()


def pc_range_filter(points: np.ndarray, bounds) -> np.ndarray:
    """Keep points inside [x0,x1]x[y0,y1]x[z0,z1]."""
    lib = _load()
    b = np.ascontiguousarray(bounds, np.float32)
    if lib is None:
        m = (
            (points[:, 0] >= b[0]) & (points[:, 0] <= b[1])
            & (points[:, 1] >= b[2]) & (points[:, 1] <= b[3])
            & (points[:, 2] >= b[4]) & (points[:, 2] <= b[5])
        )
        return points[m]
    pts = _prep(points)
    n = lib.pc_range_filter(pts, len(pts), pts.shape[1], b)
    return pts[:n]


def pc_gauss_distort(points: np.ndarray, sigmas, seed: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        out = points.copy()
        for a in range(3):
            out[:, a] += rng.normal(0, sigmas[a], len(out))
        return out
    pts = _prep(points)
    lib.pc_gauss_distort(
        pts, len(pts), pts.shape[1], np.ascontiguousarray(sigmas, np.float32), seed
    )
    return pts


def pc_dropout(points: np.ndarray, p_keep: float, seed: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        return points[rng.rand(len(points)) < p_keep]
    pts = _prep(points)
    n = lib.pc_dropout(pts, len(pts), pts.shape[1], p_keep, seed)
    return pts[:n]


def pc_rotate_z(points: np.ndarray, angle: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        from faster_rcnn_pytorch_multimodal_tpu.data.augment import (
            rotate_points_along_z,
        )

        return rotate_points_along_z(points, angle)
    pts = _prep(points)
    lib.pc_rotate_z(pts, len(pts), pts.shape[1], angle)
    return pts


def pc_flip_y(points: np.ndarray) -> np.ndarray:
    lib = _load()
    pts = _prep(points)
    if lib is None:
        pts[:, 1] *= -1
        return pts
    lib.pc_flip_y(pts, len(pts), pts.shape[1])
    return pts


def pc_flip_x(points: np.ndarray, x_max: float) -> np.ndarray:
    lib = _load()
    pts = _prep(points)
    if lib is None:
        pts[:, 0] = -pts[:, 0] + x_max
        return pts
    lib.pc_flip_x(pts, len(pts), pts.shape[1], x_max)
    return pts


def pc_swap_xy(points: np.ndarray, y_min: float, x_range_mean: float) -> np.ndarray:
    lib = _load()
    pts = _prep(points)
    if lib is None:
        x, y = pts[:, 0].copy(), pts[:, 1].copy()
        pts[:, 0] = y - y_min
        pts[:, 1] = x - x_range_mean
        return pts
    lib.pc_swap_xy(pts, len(pts), pts.shape[1], y_min, x_range_mean)
    return pts


def pc_rain_sim(
    points: np.ndarray, rain_rate: float, max_range: float, seed: int
) -> np.ndarray:
    lib = _load()
    if lib is None:
        from faster_rcnn_pytorch_multimodal_tpu.data.augment import rain_sim

        return rain_sim(points, rain_rate, max_range, np.random.RandomState(seed & 0x7FFFFFFF))
    pts = _prep(points)
    n = lib.pc_rain_sim(pts, len(pts), pts.shape[1], rain_rate, max_range, seed)
    return pts[:n]
