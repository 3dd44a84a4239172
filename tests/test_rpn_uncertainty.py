"""RPN-stage uncertainty (the UC.EN_RPN_* flag surface, SURVEY §2.1):
aleatoric RPN heads train with Bayesian CE, epistemic RPN MC sampling is a
vmapped sample axis, and per-proposal RPN uncertainties come out of
forward_test."""

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN
from faster_rcnn_pytorch_multimodal_tpu.training.solver import (
    create_train_state,
    make_train_step,
)

_TINY = (
    "NET_TYPE", "image", "NET_VARIANT", "res18",
    "TRAIN.RPN_POST_NMS_TOP_N", "32",
    "TEST.RPN_POST_NMS_TOP_N", "16",
    "TRAIN.ROI_BATCH_SIZE", "16",
    "STATIC.NMS_PRE_TRAIN", "128",
    "STATIC.NMS_PRE_TEST", "64",
    "STATIC.MAX_GT", "8",
    "ANCHOR_SCALES", "[2,4]",
    "ANCHOR_RATIOS", "[0.5,1,2]",
    "PIXEL_STDDEVS", "[60.,60.,60.]",
    "UC.A_NUM_CE_SAMPLE", "8",
    "UC.E_NUM_SAMPLE", "3",
)


def _run(cfg, n_steps=1):
    ds = SyntheticDataset(cfg, num_frames=4, num_classes=2, image_hw=(64, 96))
    loader = BatchLoader(ds, cfg, batch_size=2, seed=0)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, loader.peek())
    step = make_train_step(model, opt)
    losses = None
    for _ in range(n_steps):
        batch = {k: jnp.asarray(v) for k, v in loader.next().items()}
        state, losses = step(state, batch, rng)
    out = model.apply(
        state.params,
        batch["data"],
        batch["window"],
        method=FasterRCNN.forward_test,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    return losses, out


def test_rpn_aleatoric():
    cfg = cfg_from_list(
        default_config(),
        _TINY
        + ("UC.EN_RPN_CLS_ALEATORIC", "True", "UC.EN_RPN_BBOX_ALEATORIC", "True"),
    )
    losses, out = _run(cfg)
    assert np.isfinite(float(losses["total_loss"]))
    assert np.isfinite(float(losses["rpn_cross_entropy"]))
    un = out["rpn_uncertainties"]
    p = out["rois"].shape[1]
    b = out["rois"].shape[0]
    for k in ("a_entropy", "a_mutual_info", "a_cls_var", "a_bbox_var"):
        assert k in un, k
        assert un[k].shape[:2] == (b, p)
        assert np.all(np.isfinite(np.asarray(un[k])))
    assert un["a_bbox_var"].shape == (b, p, 4)
    assert np.all(np.asarray(un["a_cls_var"]) >= 0)


def test_rpn_epistemic():
    cfg = cfg_from_list(
        default_config(),
        _TINY
        + ("UC.EN_RPN_CLS_EPISTEMIC", "True", "UC.EN_RPN_BBOX_EPISTEMIC", "True"),
    )
    assert cfg.uc.rpn_epistemic
    losses, out = _run(cfg)
    assert np.isfinite(float(losses["total_loss"]))
    un = out["rpn_uncertainties"]
    b, p = out["rois"].shape[:2]
    for k in ("e_entropy", "e_mutual_info", "e_cls_var", "e_bbox_var"):
        assert k in un, k
        assert un[k].shape[:2] == (b, p)
        assert np.all(np.isfinite(np.asarray(un[k])))
    assert un["e_bbox_var"].shape == (b, p, 4)
    # dropout across MC samples must produce nonzero epistemic spread
    assert float(np.asarray(un["e_bbox_var"]).max()) > 0.0


def test_rpn_only_mode_exports_rpn_uncertainties():
    cfg = cfg_from_list(
        default_config(),
        _TINY + ("ENABLE_FULL_NET", "False", "UC.EN_RPN_CLS_EPISTEMIC", "True"),
    )
    losses, out = _run(cfg)
    assert "cls_prob" not in out
    assert "e_entropy" in out["rpn_uncertainties"]
