"""Tests for tools/quality_run.py helpers (the round-4 evidence tooling).

Covers the fp-taxonomy classifier and the resumable --emit suite logic;
the heavy run_one path is exercised by the suite itself (QUALITY_r4.json).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import quality_run  # noqa: E402


def _iou2d(gt, det):
    gt = np.atleast_2d(np.asarray(gt, np.float64))
    det = np.asarray(det, np.float64)
    ix = np.maximum(
        0.0,
        np.minimum(gt[:, 2], det[2]) - np.maximum(gt[:, 0], det[0]) + 1,
    )
    iy = np.maximum(
        0.0,
        np.minimum(gt[:, 3], det[3]) - np.maximum(gt[:, 1], det[1]) + 1,
    )
    inter = ix * iy
    a_gt = (gt[:, 2] - gt[:, 0] + 1) * (gt[:, 3] - gt[:, 1] + 1)
    a_dt = (det[2] - det[0] + 1) * (det[3] - det[1] + 1)
    return inter / (a_gt + a_dt - inter)


def test_fp_taxonomy_classes():
    gt_frames = {"f0": {"boxes": np.array([[0.0, 0.0, 99.0, 99.0]])}}
    fps = [
        # IoU 1.0 with the (already matched) GT -> duplicate
        {"frame_id": "f0", "bbox": np.array([0.0, 0.0, 99.0, 99.0])},
        # IoU ~0.33 -> localization
        {"frame_id": "f0", "bbox": np.array([0.0, 0.0, 99.0, 32.0])},
        # far away -> background
        {"frame_id": "f0", "bbox": np.array([500.0, 500.0, 520.0, 520.0])},
        # unknown frame -> background
        {"frame_id": "f9", "bbox": np.array([0.0, 0.0, 9.0, 9.0])},
    ]
    tax = quality_run.fp_taxonomy(fps, gt_frames, _iou2d, thresh=0.5)
    assert tax == {"duplicate": 1, "localization": 1, "background": 2}


def test_fp_taxonomy_empty_gt_counts_background():
    gt_frames = {"f0": {"boxes": np.zeros((0, 4))}}
    fps = [{"frame_id": "f0", "bbox": np.array([0.0, 0.0, 9.0, 9.0])}]
    tax = quality_run.fp_taxonomy(fps, gt_frames, _iou2d, thresh=0.5)
    assert tax == {"duplicate": 0, "localization": 0, "background": 1}


def test_emit_suite_resumes_completed_legs(tmp_path, monkeypatch):
    path = str(tmp_path / "Q.json")
    # pre-seed two completed legs; the stub fails if either is re-run
    done = {
        "image_overfit": {"final": {"map": 1.0}},
        "image_scratch": {"final": {"map": 0.7}},
        "image_scratch_long": {"final": {"map": 0.8}},
    }
    with open(path, "w") as f:
        json.dump(done, f)

    ran = []

    def fake_spawn(argv, tmp):
        args = quality_run.build_parser().parse_args(argv + ["--out", tmp])
        name = f"{args.mode}{'_overfit' if args.overfit else ''}"
        ran.append(name)
        assert not (args.mode == "image" and not args.overfit
                    and not (args.fpn or args.uc
                             or args.rpn_pos is not None)), \
            "completed plain-image legs must be skipped"
        with open(tmp, "w") as f:
            json.dump({"final": {"map": 0.5, "map_bev": 0.4},
                       "mode": args.mode}, f)
        return 0

    monkeypatch.setattr(quality_run, "_spawn_leg", fake_spawn)
    out = quality_run.emit_suite(path)
    # image legs preserved verbatim, bev + fpn + uc legs (re)run
    assert out["image_overfit"] == done["image_overfit"]
    assert out["image_scratch"] == done["image_scratch"]
    # bev_overfit + bev_scratch_rotated + bev_scratch_parity + bev long
    # + fpn_scratch + image_uc_scratch + image_scratch_tuned
    assert len(ran) == 7
    with open(path) as f:
        assert set(json.load(f)) == {
            "image_overfit", "image_scratch", "image_scratch_long",
            "bev_overfit", "bev_scratch_rotated", "bev_scratch_parity",
            "bev_scratch_long_rotated", "fpn_scratch", "image_uc_scratch",
            "image_scratch_tuned",
        }


def test_emit_suite_reruns_stale_bev_schema(tmp_path, monkeypatch):
    """ADVICE r4: a bev leg whose final predates the map_bev metric must
    re-run so the headline BEV AP lands in the artifact."""
    path = str(tmp_path / "Q.json")
    stale = {
        "bev_overfit": {"final": {"map": 0.5}, "mode": "bev"},
        "bev_scratch_rotated": {"final": {"map": 0.4, "map_bev": 0.6},
                                "mode": "bev"},
    }
    with open(path, "w") as f:
        json.dump(stale, f)

    ran = []

    def fake_spawn(argv, tmp):
        args = quality_run.build_parser().parse_args(argv + ["--out", tmp])
        ran.append((args.mode, bool(args.overfit)))
        with open(tmp, "w") as f:
            json.dump({"final": {"map": 0.5, "map_bev": 0.4},
                       "mode": args.mode}, f)
        return 0

    monkeypatch.setattr(quality_run, "_spawn_leg", fake_spawn)
    out = quality_run.emit_suite(path)
    # the fresh-schema rotated leg is preserved; the stale one re-ran
    assert out["bev_scratch_rotated"] == stale["bev_scratch_rotated"]
    assert "map_bev" in out["bev_overfit"]["final"]
    assert ("bev", True) in ran
