"""Box transform tests: round trips + the diagonal-normalization property
that distinguishes this parameterization from standard Faster R-CNN
(ref: lib/model/bbox_transform.py:55,64-65)."""

import numpy as np
import jax.numpy as jnp

from faster_rcnn_pytorch_multimodal_tpu.ops.box_transform import (
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    lidar_3d_bbox_transform,
    lidar_3d_bbox_transform_inv,
    uncertainty_transform_inv,
)


def _rand_boxes(n, seed=0, lo=0, hi=500):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(lo, hi, n)
    y1 = rng.uniform(lo, hi, n)
    w = rng.uniform(5, 100, n)
    h = rng.uniform(5, 100, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_bbox_transform_roundtrip():
    # NOTE the reference convention: encode uses +1-inclusive widths but the
    # decode emits x2 = cx + w/2 without the matching -1, so a faithful
    # round trip recovers x1/y1 exactly and x2/y2 shifted by +1
    # (ref bbox_transform.py:59-62 vs :96-103).  We replicate, not fix.
    ex = _rand_boxes(64, 1)
    gt = _rand_boxes(64, 2)
    deltas = bbox_transform(jnp.asarray(ex), jnp.asarray(gt))
    rec = np.asarray(bbox_transform_inv(jnp.asarray(ex), deltas))
    expect = gt + np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(rec, expect, rtol=1e-4, atol=1e-2)


def test_bbox_transform_diagonal_normalization():
    # a pure x-shift of d pixels must encode to dx = d / sqrt(w^2+h^2)
    ex = np.array([[0.0, 0.0, 29.0, 39.0]], dtype=np.float32)  # w=30, h=40
    gt = np.array([[10.0, 0.0, 39.0, 39.0]], dtype=np.float32)
    d = bbox_transform(jnp.asarray(ex), jnp.asarray(gt))
    np.testing.assert_allclose(np.asarray(d[0, 0]), 10.0 / 50.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d[0, 1]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(d[0, 2:]), 0.0, atol=1e-7)


def test_bbox_transform_inv_multiclass():
    ex = _rand_boxes(8, 3)
    gt = _rand_boxes(8, 4)
    d1 = bbox_transform(jnp.asarray(ex), jnp.asarray(gt))
    # 3 classes, class 1 holds the real deltas
    deltas = jnp.concatenate([jnp.zeros_like(d1), d1, jnp.zeros_like(d1)], axis=1)
    rec = bbox_transform_inv(jnp.asarray(ex), deltas)
    expect = gt + np.array([0.0, 0.0, 1.0, 1.0], np.float32)  # see roundtrip note
    np.testing.assert_allclose(np.asarray(rec[:, 4:8]), expect, rtol=1e-4, atol=1e-2)


def test_clip_boxes():
    boxes = jnp.array([[-5.0, -10.0, 800.0, 900.0, 10.0, 10.0, 20.0, 20.0]])
    window = jnp.array([0.0, 640.0, 0.0, 480.0])
    out = np.asarray(clip_boxes(boxes, window))
    np.testing.assert_allclose(out[0, :4], [0, 0, 639, 479])
    np.testing.assert_allclose(out[0, 4:], [10, 10, 20, 20])


def test_lidar_transform_roundtrip():
    rng = np.random.RandomState(7)
    n = 32
    rois = _rand_boxes(n, 5, lo=0, hi=600)
    anchors = np.zeros((n, 7), dtype=np.float32)
    anchors[:, 2] = 0.9
    anchors[:, 5] = 1.8
    gt = np.zeros((n, 7), dtype=np.float32)
    gt[:, 0] = rng.uniform(0, 700, n)
    gt[:, 1] = rng.uniform(0, 700, n)
    gt[:, 2] = rng.uniform(0.2, 3.0, n)
    gt[:, 3] = rng.uniform(10, 60, n)
    gt[:, 4] = rng.uniform(10, 40, n)
    gt[:, 5] = rng.uniform(1.0, 2.5, n)
    gt[:, 6] = rng.uniform(-np.pi / 2, np.pi / 2, n)

    t = lidar_3d_bbox_transform(jnp.asarray(rois), jnp.asarray(anchors), jnp.asarray(gt))
    rec = lidar_3d_bbox_transform_inv(jnp.asarray(rois), jnp.asarray(anchors), t)
    np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-2)


def test_uncertainty_transform_inv_scaling():
    boxes = jnp.array([[0.0, 0.0, 9.0, 19.0]])  # length 10, width 20
    uc = jnp.array([[0.5, 0.5, 0.0, 0.0]])
    out = np.asarray(uncertainty_transform_inv(boxes, uc))
    np.testing.assert_allclose(out[0, 0], (0.5 * 10) ** 2, rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], (0.5 * 20) ** 2, rtol=1e-6)
    np.testing.assert_allclose(out[0, 2:], 0.0, atol=1e-7)
