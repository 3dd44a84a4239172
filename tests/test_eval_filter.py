"""eval_utils (rotated IoU, AP, greedy matching) + detection filtering."""

import math

import numpy as np
import jax.numpy as jnp

from faster_rcnn_pytorch_multimodal_tpu.evaluation.eval_utils import (
    ap,
    evaluate_class,
    iou,
    rotated_bev_intersection,
)
from faster_rcnn_pytorch_multimodal_tpu.ops.filter import (
    filter_detections,
    to_per_class_lists,
)


def test_iou_2d_identity():
    b = np.array([10.0, 10.0, 50.0, 60.0])
    np.testing.assert_allclose(iou(b[None], b, "2d"), [1.0])


def test_rotated_bev_intersection_axis_aligned():
    a = np.array([0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0])
    b = np.array([1.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0])  # shifted by 1 in x
    np.testing.assert_allclose(rotated_bev_intersection(a, b), 3.0 * 2.0, atol=1e-6)


def test_rotated_bev_iou_cross():
    # two identical boxes rotated 90 deg: intersection = 2x2 square = 4,
    # union = 8 + 8 - 4 = 12
    a = np.array([0.0, 0.0, 0.0, 4.0, 2.0, 1.0, 0.0])
    b = np.array([0.0, 0.0, 0.0, 4.0, 2.0, 1.0, math.pi / 2])
    got = iou(a[None], b, "bev")[0]
    np.testing.assert_allclose(got, 4.0 / 12.0, atol=1e-6)


def test_iou_3d_z_overlap():
    a = np.array([0.0, 0.0, 1.0, 4.0, 2.0, 2.0, 0.0])  # z in [0, 2]
    b = np.array([0.0, 0.0, 2.0, 4.0, 2.0, 2.0, 0.0])  # z in [1, 3]
    # full BEV overlap (8), z-overlap 1 of 2 -> inter 8, union 16+16-8=24
    np.testing.assert_allclose(iou(a[None], b, "3d")[0], 8.0 / 24.0, atol=1e-6)


def test_iou_bev_aa_uses_envelope():
    a = np.array([0.0, 0.0, 0.0, 4.0, 2.0, 1.0, math.pi / 2])
    b = np.array([0.0, 0.0, 0.0, 2.0, 4.0, 1.0, 0.0])  # same envelope
    np.testing.assert_allclose(iou(a[None], b, "bev_aa")[0], 1.0, atol=1e-4)


def test_ap_perfect_and_zero():
    assert ap(np.array([0.5, 1.0]), np.array([1.0, 1.0])) == 1.0
    assert ap(np.array([0.0]), np.array([0.0])) == 0.0


def test_evaluate_class_basic():
    gt = {
        "f0": {"boxes": np.array([[0, 0, 10, 10], [50, 50, 80, 90]], float)},
        "f1": {"boxes": np.array([[20, 20, 40, 40]], float)},
    }
    dets = [
        {"frame_id": "f0", "bbox": np.array([0, 0, 10, 10.0]), "confidence": 0.9},
        {"frame_id": "f0", "bbox": np.array([51, 50, 80, 90.0]), "confidence": 0.8},
        {"frame_id": "f1", "bbox": np.array([20, 20, 40, 40.0]), "confidence": 0.7},
        {"frame_id": "f1", "bbox": np.array([200, 200, 240, 240.0]), "confidence": 0.6},
    ]
    res = evaluate_class(dets, gt, iou_thresh=0.5, eval_type="2d")
    assert res["npos"] == 3
    assert res["tp"] == 3
    assert res["fp"] == 1
    np.testing.assert_allclose(res["ap"], 1.0)  # FP is last, full recall first


def test_evaluate_class_duplicate_is_fp():
    gt = {"f0": {"boxes": np.array([[0, 0, 10, 10.0]])}}
    dets = [
        {"frame_id": "f0", "bbox": np.array([0, 0, 10, 10.0]), "confidence": 0.9},
        {"frame_id": "f0", "bbox": np.array([0, 0, 10, 10.0]), "confidence": 0.8},
    ]
    res = evaluate_class(dets, gt, 0.5)
    assert res["tp"] == 1 and res["fp"] == 1


def test_filter_detections_image():
    s, k = 8, 3
    cls_prob = np.full((s, k), 0.05, np.float32)
    boxes = np.zeros((s, 4 * k), np.float32)
    # two strong class-1 dets, overlapping -> NMS keeps one
    cls_prob[0, 1] = 0.9
    cls_prob[1, 1] = 0.8
    boxes[0, 4:8] = [10, 10, 50, 50]
    boxes[1, 4:8] = [12, 12, 52, 52]
    # one strong class-2 det
    cls_prob[2, 2] = 0.7
    boxes[2, 8:12] = [100, 100, 140, 160]
    out = filter_detections(
        jnp.asarray(cls_prob), jnp.asarray(boxes), jnp.ones(s, bool),
        num_classes=k, bbox_elem=4, max_dets=5, thresh=0.5, nms_thresh=0.5,
    )
    valid = np.asarray(out["valid"])
    assert valid[0].sum() == 0  # background never kept
    assert valid[1].sum() == 1  # NMS collapsed the duplicate
    assert valid[2].sum() == 1
    np.testing.assert_allclose(np.asarray(out["scores"])[1, 0], 0.9)

    all_boxes, all_uc = to_per_class_lists(
        out, {"e_entropy": np.arange(s, dtype=np.float32)}, k, 4
    )
    assert all_boxes[1].shape == (1, 5)
    np.testing.assert_allclose(all_boxes[1][0, :4], [10, 10, 50, 50])
    np.testing.assert_allclose(all_uc[1]["e_entropy"][0, 0], 0.0)  # src roi 0


def test_filter_detections_lidar_aabb_nms():
    s, k = 4, 2
    cls_prob = np.full((s, k), 0.05, np.float32)
    boxes = np.zeros((s, 7 * k), np.float32)
    # same center/dims, different rotation: AABB NMS ignores ry (ref :55-63)
    cls_prob[0, 1] = 0.9
    cls_prob[1, 1] = 0.8
    boxes[0, 7:14] = [50, 50, 1, 40, 20, 2, 0.0]
    boxes[1, 7:14] = [50, 50, 1, 40, 20, 2, 0.1]
    out = filter_detections(
        jnp.asarray(cls_prob), jnp.asarray(boxes), jnp.ones(s, bool),
        num_classes=k, bbox_elem=7, max_dets=4, thresh=0.5, nms_thresh=0.5,
        is_lidar=True,
    )
    assert np.asarray(out["valid"])[1].sum() == 1
    np.testing.assert_allclose(np.asarray(out["boxes"])[1, 0, 6], 0.0)
