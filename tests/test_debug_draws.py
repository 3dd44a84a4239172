"""DEBUG draw switches produce real canvases (DRAW_ANCHORS, DRAW_ANCHOR_T,
DRAW_PROPOSAL_T — ref lib/model/config.py:19-31; the reference's de-facto
verification tooling, SURVEY §4)."""

import os

import jax
import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN
from faster_rcnn_pytorch_multimodal_tpu.training.solver import create_train_state
from faster_rcnn_pytorch_multimodal_tpu.utils import debug_draw as dd

_TINY = (
    "NET_TYPE", "image", "NET_VARIANT", "res18",
    "TRAIN.RPN_POST_NMS_TOP_N", "32",
    "TRAIN.ROI_BATCH_SIZE", "16",
    "STATIC.NMS_PRE_TRAIN", "128",
    "STATIC.MAX_GT", "8",
    "ANCHOR_SCALES", "[2,4]",
    "ANCHOR_RATIOS", "[1]",
    "PIXEL_STDDEVS", "[60.,60.,60.]",
)


def test_debug_draws(tmp_path):
    cfg = cfg_from_list(default_config(), _TINY)
    ds = SyntheticDataset(cfg, num_frames=4, num_classes=2, image_hw=(64, 96))
    loader = BatchLoader(ds, cfg, batch_size=2, seed=0)
    batch = loader.next()
    out = str(tmp_path)

    p1 = dd.draw_anchors(cfg, batch, out)
    assert os.path.exists(p1)

    p2 = dd.draw_anchor_targets(cfg, batch, out)
    assert os.path.exists(p2)

    model = FasterRCNN(cfg=cfg, num_classes=2)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), loader.peek())
    p3 = dd.draw_proposal_targets(cfg, model, state.params, batch, out)
    assert os.path.exists(p3)
    from PIL import Image

    assert Image.open(p3).size[0] >= 96
