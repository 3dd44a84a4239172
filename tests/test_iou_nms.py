"""IoU vs a numpy oracle of the reference formula; NMS vs a greedy oracle
implementing torchvision semantics."""

import numpy as np
import jax.numpy as jnp

from faster_rcnn_pytorch_multimodal_tpu.ops.iou import bbox_overlaps, bbox_3d_to_bev_aabb
from faster_rcnn_pytorch_multimodal_tpu.ops.nms import nms


def _np_overlaps_plus1(boxes, query):
    """Oracle for ref lib/utils/bbox.py:5-33."""
    ba = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    qa = (query[:, 2] - query[:, 0] + 1) * (query[:, 3] - query[:, 1] + 1)
    iw = np.clip(
        np.minimum(boxes[:, None, 2], query[None, :, 2])
        - np.maximum(boxes[:, None, 0], query[None, :, 0]) + 1, 0, None)
    ih = np.clip(
        np.minimum(boxes[:, None, 3], query[None, :, 3])
        - np.maximum(boxes[:, None, 1], query[None, :, 1]) + 1, 0, None)
    inter = iw * ih
    return inter / (ba[:, None] + qa[None, :] - inter)


def _np_nms(boxes, scores, thresh):
    """Greedy NMS oracle (torchvision semantics: no +1, suppress iou>thresh)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > thresh
    return np.array(keep)


def _rand_boxes(n, seed):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, 400, n)
    y1 = rng.uniform(0, 400, n)
    w = rng.uniform(5, 120, n)
    h = rng.uniform(5, 120, n)
    return np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)


def test_bbox_overlaps_matches_reference():
    a = _rand_boxes(50, 0)
    b = _rand_boxes(20, 1)
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_overlaps_plus1(a, b), rtol=1e-5)


def test_nms_matches_greedy_oracle():
    for seed in range(5):
        boxes = _rand_boxes(200, seed)
        scores = np.random.RandomState(seed + 100).uniform(size=200).astype(np.float32)
        expect = _np_nms(boxes, scores, 0.5)
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 200)
        got = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(np.sort(got), np.sort(expect))
        # and score-ordered
        assert (np.diff(scores[got]) <= 1e-9).all()


def test_nms_jacobi_matches_exact_scan():
    for seed in range(4):
        boxes = _rand_boxes(300, seed + 20)
        scores = np.random.RandomState(seed).uniform(size=300).astype(np.float32)
        i1, v1 = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.6, 300)
        i2, v2 = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.6, 300, exact=True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_nms_suppression_chain():
    # chain: consecutive boxes overlap > thresh, skip-one overlap < thresh;
    # greedy keeps the even-indexed boxes.  Exercises the Jacobi iteration's
    # alternating convergence (ref: kernel of the suppression DAG).
    n = 20
    w = 10.0
    step = 3.0  # IoU(adjacent) = 7/13 = 0.54 > 0.5; IoU(skip) = 4/16 = 0.25
    boxes = np.array([[i * step, 0, i * step + w, 10] for i in range(n)], np.float32)
    scores = np.linspace(1, 0.5, n).astype(np.float32)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, n)
    kept = np.sort(np.asarray(idx)[np.asarray(valid)])
    np.testing.assert_array_equal(kept, np.arange(0, n, 2))


def test_nms_max_out_truncates():
    boxes = _rand_boxes(100, 3)
    scores = np.linspace(1, 0, 100).astype(np.float32)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.99, 10)
    assert valid.sum() == 10
    # nearly-disjoint boxes at thresh .99: top-10 scores survive
    assert set(np.asarray(idx).tolist()) <= set(range(100))


def test_nms_respects_valid_mask():
    boxes = _rand_boxes(50, 4)
    scores = np.ones(50, np.float32)
    valid = np.zeros(50, bool)
    valid[:5] = True
    idx, keep_valid = nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.9, 50, valid=jnp.asarray(valid)
    )
    assert set(np.asarray(idx)[np.asarray(keep_valid)]) <= set(range(5))


def test_bev_aabb():
    box = jnp.array([[50.0, 60.0, 1.0, 40.0, 20.0, 2.0, np.pi / 2]])
    out = np.asarray(bbox_3d_to_bev_aabb(box))
    np.testing.assert_allclose(out[0], [40, 40, 60, 80], atol=1e-4)
