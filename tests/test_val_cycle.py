"""Solver val-cycle parity (ref train_val.py:402-445):
  * full-net mode draws val detections every val interval;
  * RPN-only mode logs proposal recall from the NMSed proposals.
"""

import glob
import json
import os

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN
from faster_rcnn_pytorch_multimodal_tpu.training.solver import Solver

_TINY = (
    "NET_TYPE", "image", "NET_VARIANT", "res18",
    "TRAIN.RPN_POST_NMS_TOP_N", "32",
    "TEST.RPN_POST_NMS_TOP_N", "16",
    "TRAIN.ROI_BATCH_SIZE", "16",
    "STATIC.NMS_PRE_TRAIN", "128",
    "STATIC.NMS_PRE_TEST", "64",
    "STATIC.MAX_GT", "8",
    "ANCHOR_SCALES", "[2,4]",
    "ANCHOR_RATIOS", "[1]",
    "PIXEL_STDDEVS", "[60.,60.,60.]",
    "TRAIN.SNAPSHOT_ITERS", "100",
    "TRAIN.LEARNING_RATE", "0.001",
)


def _loaders(cfg):
    ds = SyntheticDataset(cfg, num_frames=6, num_classes=2, image_hw=(64, 96))
    train = BatchLoader(ds, cfg, batch_size=2, seed=0)
    val = BatchLoader(ds, cfg, batch_size=2, seed=1, augment=False)
    return train, val


def test_val_cycle_draws_detections(tmp_path):
    cfg = cfg_from_list(default_config(), _TINY)
    assert cfg.train.draw_val_detections
    train, val = _loaders(cfg)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    solver = Solver(cfg, model, train, val_loader=val, output_dir=str(tmp_path))
    solver.train(max_iters=2, log_every=2)
    draws = glob.glob(os.path.join(str(tmp_path), "val_draws", "iter_2", "*.png"))
    assert draws, "val cycle produced no detection drawings"
    # drawn canvases are real images (loader pads to 64px buckets)
    from PIL import Image

    im = Image.open(draws[0])
    assert im.size[0] >= 96 and im.size[1] >= 64


def test_rpn_only_val_logs_recall(tmp_path):
    cfg = cfg_from_list(default_config(), _TINY + ("ENABLE_FULL_NET", "False"))
    train, val = _loaders(cfg)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    solver = Solver(cfg, model, train, val_loader=val, output_dir=str(tmp_path))
    solver.train(max_iters=2, log_every=2)
    lines = [
        json.loads(l)
        for l in open(os.path.join(str(tmp_path), "tb_val", "scalars.jsonl"))
    ]
    assert any("rpn_recall" in rec for rec in lines)
    rec = [r for r in lines if "rpn_recall" in r][-1]
    assert 0.0 <= rec["rpn_recall"] <= 1.0


def test_proposal_recall_math():
    from faster_rcnn_pytorch_multimodal_tpu.evaluation.drawing import (
        proposal_recall,
    )

    rois = np.array([[[0, 0, 10, 10], [20, 20, 30, 30]]], np.float32)
    valid = np.array([[True, True]])
    gt = np.array([[[0, 0, 10, 10], [50, 50, 60, 60]]], np.float32)
    mask = np.array([[True, True]])
    covered, total = proposal_recall(rois, valid, gt, mask)
    assert (covered, total) == (1, 2)
    # invalid proposals don't count
    covered, total = proposal_recall(
        rois, np.array([[False, True]]), gt, mask
    )
    assert (covered, total) == (0, 2)
