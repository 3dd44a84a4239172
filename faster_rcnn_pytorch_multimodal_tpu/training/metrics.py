"""Training metrics/observability.

Replaces the reference's tensorboardX FileWriter pair (train + '_val',
ref lib/model/train_val.py:210-211, get_output_tb_dir) with:
  * an always-on JSONL scalar log (machine-readable, no deps),
  * optional TensorBoard event files via torch.utils.tensorboard when
    available (same scalar tags the reference used),
  * the reference's console display contract ("speed: s/iter",
    ref train_val.py:463-468) stays in the Solver.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str, suffix: str = ""):
        self.log_dir = log_dir + (f"_{suffix}" if suffix else "")
        os.makedirs(self.log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.log_dir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(self.log_dir)
        except Exception:
            pass

    def scalars(self, step: int, values: Dict[str, float]):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), int(step))

    def image(self, step: int, tag: str, image, save_png: bool = True):
        """HWC uint8 image -> tensorboard (and optionally a PNG next to the
        log; callers that already saved the frame elsewhere pass False)."""
        if self._tb is not None:
            self._tb.add_image(tag, image, int(step), dataformats="HWC")
        if save_png:
            from faster_rcnn_pytorch_multimodal_tpu.utils.visualization import (
                save_image,
            )

            save_image(
                image,
                os.path.join(self.log_dir, f"{tag.replace('/', '_')}_{step}.png"),
            )

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
