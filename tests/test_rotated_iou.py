"""Rotated-BEV IoU op + rotated NMS (framework extension, TEST.ROTATED_NMS).

The jnp candidate-vertex formulation (ops/rotated_iou.py) is checked against
the host-side Sutherland-Hodgman oracle (evaluation/eval_utils.py) that the
metrics already trust, then the NMS integration against the reference-parity
AABB behavior it optionally replaces (ref lib/utils/filter_predictions.py:55-67).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from faster_rcnn_pytorch_multimodal_tpu.evaluation.eval_utils import (
    rotated_bev_intersection,
)
from faster_rcnn_pytorch_multimodal_tpu.ops.filter import filter_detections
from faster_rcnn_pytorch_multimodal_tpu.ops.nms import _iou_no_plus1, nms
from faster_rcnn_pytorch_multimodal_tpu.ops.rotated_iou import rotated_iou_matrix


def _random_boxes5(rng, n):
    """[xc, yc, l, w, ry] with car-ish BEV extents."""
    return np.stack(
        [
            rng.uniform(-40, 40, n),
            rng.uniform(-40, 40, n),
            rng.uniform(1.0, 8.0, n),
            rng.uniform(1.0, 4.0, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=1,
    ).astype(np.float32)


def _to7(b5):
    """(n, 5) -> (n, 7) [xc, yc, zc, l, w, h, ry] for the numpy oracle."""
    n = len(b5)
    out = np.zeros((n, 7), np.float64)
    out[:, 0:2] = b5[:, 0:2]
    out[:, 3:5] = b5[:, 2:4]
    out[:, 5] = 1.5
    out[:, 6] = b5[:, 4]
    return out


def test_rotated_iou_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    a = _random_boxes5(rng, 24)
    b = _random_boxes5(rng, 24)
    # cluster half of b near a so a good fraction of pairs overlap
    b[:12, :2] = a[:12, :2] + rng.uniform(-2, 2, (12, 2)).astype(np.float32)
    got = np.asarray(rotated_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    a7, b7 = _to7(a), _to7(b)
    for i in range(len(a)):
        for j in range(len(b)):
            inter = rotated_bev_intersection(a7[i], b7[j])
            union = a7[i, 3] * a7[i, 4] + b7[j, 3] * b7[j, 4] - inter
            want = inter / union if union > 0 else 0.0
            assert got[i, j] == pytest.approx(want, abs=2e-4), (i, j)
    assert (got > 0.05).sum() > 10  # the comparison actually exercised overlaps


def test_rotated_iou_axis_aligned_matches_aabb():
    rng = np.random.default_rng(1)
    a = _random_boxes5(rng, 16)
    a[:, 4] = 0.0
    corners = np.stack(
        [
            a[:, 0] - a[:, 2] / 2,
            a[:, 1] - a[:, 3] / 2,
            a[:, 0] + a[:, 2] / 2,
            a[:, 1] + a[:, 3] / 2,
        ],
        axis=1,
    )
    got = np.asarray(rotated_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    want = np.asarray(_iou_no_plus1(jnp.asarray(corners), jnp.asarray(corners)))
    np.testing.assert_allclose(got, want, atol=1e-4)
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-4)


def test_rotated_nms_chunked_matches_exact():
    rng = np.random.default_rng(2)
    b = _random_boxes5(rng, 80)
    b[:, 0:2] = rng.uniform(-10, 10, (80, 2))  # dense -> real suppression chains
    scores = rng.uniform(0.1, 1.0, 80).astype(np.float32)
    kc, vc = nms(jnp.asarray(b), jnp.asarray(scores), 0.3, 40, rotated=True)
    ke, ve = nms(
        jnp.asarray(b), jnp.asarray(scores), 0.3, 40, rotated=True, exact=True
    )
    np.testing.assert_array_equal(np.asarray(vc), np.asarray(ve))
    np.testing.assert_array_equal(
        np.asarray(kc)[np.asarray(vc)], np.asarray(ke)[np.asarray(ve)]
    )
    assert 1 < np.asarray(vc).sum() < 80


def test_rotated_nms_catches_heading_offset_duplicate():
    """The duplicate the reference's rotation-ignoring AABB NMS keeps:
    same 45-degree heading, center slid ~1.1m along the major axis.
    True rotated IoU ~0.68 (duplicate); the no-rotation center±dim AABBs
    overlap at only ~0.35 (kept)."""
    t = np.pi / 4
    dup = np.array(
        [
            [0.0, 0.0, 6.0, 2.0, t],
            [0.8, 0.8, 6.0, 2.0, t],
        ],
        np.float32,
    )
    riou = np.asarray(rotated_iou_matrix(jnp.asarray(dup), jnp.asarray(dup)))
    assert riou[0, 1] > 0.6
    aabb = np.stack(
        [dup[:, 0] - 3, dup[:, 1] - 1, dup[:, 0] + 3, dup[:, 1] + 1], axis=1
    )
    aiou = np.asarray(_iou_no_plus1(jnp.asarray(aabb), jnp.asarray(aabb)))
    assert aiou[0, 1] < 0.6

    scores = np.array([0.9, 0.8], np.float32)
    _, v_rot = nms(jnp.asarray(dup), jnp.asarray(scores), 0.6, 2, rotated=True)
    _, v_aabb = nms(jnp.asarray(aabb), jnp.asarray(scores), 0.6, 2)
    assert np.asarray(v_rot).sum() == 1  # rotated: duplicate suppressed
    assert np.asarray(v_aabb).sum() == 2  # reference AABB behavior: both kept


def test_filter_detections_rotated_nms_flag():
    s, k = 4, 2
    cls_prob = np.full((s, k), 0.05, np.float32)
    boxes = np.zeros((s, 7 * k), np.float32)
    t = np.pi / 4
    cls_prob[0, 1] = 0.9
    cls_prob[1, 1] = 0.8
    boxes[0, 7:14] = [0.0, 0.0, 1.0, 6.0, 2.0, 2.0, t]
    boxes[1, 7:14] = [0.8, 0.8, 1.0, 6.0, 2.0, 2.0, t]
    common = dict(
        num_classes=k, bbox_elem=7, max_dets=4, thresh=0.5, nms_thresh=0.6,
        is_lidar=True,
    )
    out_ref = filter_detections(
        jnp.asarray(cls_prob), jnp.asarray(boxes), jnp.ones(s, bool), **common
    )
    out_rot = filter_detections(
        jnp.asarray(cls_prob), jnp.asarray(boxes), jnp.ones(s, bool),
        rotated_nms=True, **common
    )
    assert np.asarray(out_ref["valid"])[1].sum() == 2  # parity default
    assert np.asarray(out_rot["valid"])[1].sum() == 1  # extension dedups
    np.testing.assert_allclose(np.asarray(out_rot["scores"])[1, 0], 0.9)
