"""Evaluation: AP computation, 2D/BEV/3D IoU (incl. rotated boxes), and the
per-dataset eval drivers (re-implementation of the reference's eval stack,
including the ABSENT lib/utils/eval_utils.py — interface reconstructed in
SURVEY.md §2.14)."""

from faster_rcnn_pytorch_multimodal_tpu.evaluation.eval_utils import (  # noqa: F401
    ap,
    iou,
)
