"""Uncertainty det-file round trip + per-scene aggregation + frame counts
(VERDICT round-1 item 5: the missing-eval_utils uncertainty surface,
ref waymo_eval.py:106, 148-155, 207-221)."""

from __future__ import annotations

import os
from dataclasses import replace

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import Config
from faster_rcnn_pytorch_multimodal_tpu.data.db_base import UC_KEYS, DetectionDB
from faster_rcnn_pytorch_multimodal_tpu.evaluation import eval_utils as eu


class _ImgDB(DetectionDB):
    _classes = ("dontcare", "car")
    type = "image"

    def __init__(self, cfg):
        self.name = "fake"
        self.cfg = cfg
        self.mode = "val"
        self._rng = np.random.RandomState(0)


def _mk_uncertainties(n, bbox_elem, num_classes, rs):
    return {
        "a_entropy": rs.rand(n, 1),
        "a_mutual_info": rs.rand(n, 1),
        "a_cls_var": rs.rand(n, num_classes),
        "a_bbox_var": rs.rand(n, bbox_elem),
        "e_entropy": rs.rand(n, 1),
        "e_mutual_info": rs.rand(n, 1),
        "e_cls_var": rs.rand(n, num_classes),
        "e_bbox_var": rs.rand(n, bbox_elem),
    }


def test_uncertainty_det_file_roundtrip(tmp_path):
    """write det files with trailing uncertainty columns -> extract -> the
    per-det values and per-scene averages match what was written."""
    cfg = replace(Config(), net_type="image")
    db = _ImgDB(cfg)
    rs = np.random.RandomState(3)
    num_classes, bbox_elem = 2, 4
    n_frames = 4
    counts = [2, 1, 3, 0]

    all_boxes = [[np.zeros((0, 5), np.float32)] * n_frames for _ in range(num_classes)]
    all_uc = [[{} for _ in range(n_frames)] for _ in range(num_classes)]
    written_uc = []  # per det line, dict key->vec, in file order
    for i, c in enumerate(counts):
        if c == 0:
            continue
        boxes = np.hstack(
            [rs.uniform(0, 100, (c, 4)), rs.uniform(0.5, 1.0, (c, 1))]
        ).astype(np.float32)
        uc = _mk_uncertainties(c, bbox_elem, num_classes, rs)
        all_boxes[1][i] = boxes
        all_uc[1][i] = uc
        for r in range(c):
            written_uc.append({k: uc[k][r] for k in UC_KEYS})

    frame_ids = [f"f{i}" for i in range(n_frames)]
    out = str(tmp_path)
    db.write_image_results(all_boxes, frame_ids, out, uncertainties=all_uc)

    det_path = os.path.join(out, "det_val_car.txt")
    with open(det_path) as f:
        splitlines = [l.strip().split(" ") for l in f if l.strip()]
    assert len(splitlines) == sum(counts)

    uc_avg, uc_per_det = eu.extract_uncertainties(
        bbox_elem, splitlines, num_classes=num_classes
    )
    assert set(uc_per_det) == set(UC_KEYS)
    for k in UC_KEYS:
        got = uc_per_det[k]
        want = np.stack([w[k] for w in written_uc])
        np.testing.assert_allclose(got, want, atol=1e-9)

    # per-scene aggregation: frames 0-1 -> scene 0, frames 2-3 -> scene 1
    scene_of = {"f0": 0, "f1": 0, "f2": 1, "f3": 1}
    det_cnt = {}
    for i, toks in enumerate(splitlines):
        s = scene_of[toks[0]]
        eu.accumulate_scene_uncertainty(uc_avg, uc_per_det, i, s)
        det_cnt[s] = det_cnt.get(s, 0) + 1
    assert det_cnt == {0: 3, 1: 3}
    # scene-0 average of a_entropy == mean over the 3 scene-0 det lines
    want_avg = np.mean([w["a_entropy"] for w in written_uc[:3]], axis=0)
    np.testing.assert_allclose(uc_avg["a_entropy"][0] / det_cnt[0], want_avg)

    line = eu.write_scene_uncertainty(uc_avg, det_cnt[0], 0)
    assert line.startswith("scene_idx: 0 num_dets: 3")
    assert "a_bbox_var:" in line and "e_cls_var:" in line
    assert eu.write_scene_uncertainty(uc_avg, 0, 7) == ""


def test_extract_infers_aleatoric_only_layout():
    bbox_elem, k = 4, 2
    rs = np.random.RandomState(0)
    # aleatoric only: 1 + 1 + K + E trailing columns
    n_trail = 1 + 1 + k + bbox_elem
    lines = [
        ["f0", "0.9"] + ["1.0"] * bbox_elem + [f"{v:.6f}" for v in rs.rand(n_trail)]
        for _ in range(3)
    ]
    _, uc = eu.extract_uncertainties(bbox_elem, lines, num_classes=k)
    assert set(uc) == {"a_entropy", "a_mutual_info", "a_cls_var", "a_bbox_var"}
    assert uc["a_cls_var"].shape == (3, k)


def test_frame_counts_from_evaluate_class():
    gt = {
        "f0": {"boxes": np.array([[0, 0, 10, 10]], np.float32)},
        "f1": {"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)},
    }
    dets = [
        {"frame_id": "f0", "bbox": np.array([0, 0, 10, 10]), "confidence": 0.9},
        {"frame_id": "f1", "bbox": np.array([50, 50, 60, 60]), "confidence": 0.8},
    ]
    res = eu.evaluate_class(dets, gt, iou_thresh=0.5, eval_type="2d")
    assert res["tp_frame"] == {"f0": 1, "f1": 0}
    assert res["fp_frame"] == {"f0": 0, "f1": 1}
    assert res["npos_frame"] == {"f0": 1, "f1": 2}
    out = eu.display_frame_counts(res["tp_frame"], res["fp_frame"], res["npos_frame"])
    assert "frame f0: tp 1 fp 0 npos 1" in out


def test_save_detection_results(tmp_path):
    p = eu.save_detection_results(["a", "b"], str(tmp_path), "x.txt")
    assert open(p).read() == "a\nb\n"


def test_find_rec():
    recs = [{"frame_id": "a", "v": 1}, {"frame_id": "b", "v": 2}]
    assert eu.find_rec(recs, "b")["v"] == 2
    assert eu.find_rec(recs, "zz") is None
    assert eu.find_rec({"a": {"v": 3}}, "a")["v"] == 3
