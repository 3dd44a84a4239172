"""Uncertainty configurations (aleatoric + epistemic) and FPN multiscale
pooling, end to end through the detector (train step + test outputs)."""

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
    "UC.A_NUM_CE_SAMPLE", "16",
    "UC.E_NUM_SAMPLE", "3",
)


def _run(cfg, n_steps=2, test=True):
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
    out = None
    if test:
        out = model.apply(
            state.params,
            batch["data"],
            batch["window"],
            method=FasterRCNN.forward_test,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
    return losses, out


def test_aleatoric_train_and_uncertainty_outputs():
    cfg = cfg_from_list(
        default_config(),
        _TINY + ("UC.EN_BBOX_ALEATORIC", "True", "UC.EN_CLS_ALEATORIC", "True"),
    )
    losses, out = _run(cfg)
    assert np.isfinite(float(losses["total_loss"]))
    assert "a_mutual_info" in losses
    un = out["uncertainties"]
    s = cfg.test.rpn_post_nms_top_n
    assert un["a_entropy"].shape == (2, s)
    assert un["a_mutual_info"].shape == (2, s)
    assert un["a_cls_var"].shape == (2, s, 2)
    assert un["a_bbox_var"].shape == (2, s, 8)
    assert np.isfinite(np.asarray(un["a_bbox_var"])).all()
    assert (np.asarray(un["a_bbox_var"]) >= 0).all()  # variances


def test_epistemic_mc_dropout_outputs():
    cfg = cfg_from_list(
        default_config(),
        _TINY + ("UC.EN_BBOX_EPISTEMIC", "True", "UC.EN_CLS_EPISTEMIC", "True"),
    )
    losses, out = _run(cfg)
    assert np.isfinite(float(losses["total_loss"]))
    un = out["uncertainties"]
    s = cfg.test.rpn_post_nms_top_n
    assert un["e_entropy"].shape == (2, s)
    assert un["e_mutual_info"].shape == (2, s)
    assert un["e_cls_var"].shape == (2, s, 2)
    assert un["e_bbox_var"].shape == (2, s, 8)
    # MC dropout variance must be nonzero somewhere (samples differ)
    assert np.asarray(un["e_bbox_var"]).max() > 0
    assert np.asarray(un["e_mutual_info"]).max() > 1e-6


def test_rpn_aleatoric_train():
    cfg = cfg_from_list(default_config(), _TINY + ("UC.EN_RPN_BBOX_ALEATORIC", "True"))
    losses, _ = _run(cfg, test=False)
    assert np.isfinite(float(losses["rpn_loss_box"]))


def test_fpn_multiscale_train_and_test():
    cfg = cfg_from_list(
        default_config(),
        _TINY + ("USE_FPN", "True", "POOLING_MODE", "multiscale"),
    )
    losses, out = _run(cfg)
    assert np.isfinite(float(losses["total_loss"]))
    s = cfg.test.rpn_post_nms_top_n
    assert out["cls_prob"].shape == (2, s, 2)
    # FPN RPN runs at stride 4 (ref imagenet.py:32-36)
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import feat_stride

    assert feat_stride(cfg) == 4


def test_rpn_only_mode():
    cfg = cfg_from_list(default_config(), _TINY + ("ENABLE_FULL_NET", "False"))
    losses, out = _run(cfg)
    assert float(losses["cross_entropy"]) == 0.0
    assert float(losses["loss_box"]) == 0.0
    assert float(losses["rpn_cross_entropy"]) > 0.0
    # RPN-only test output: proposals + scores, no classification head
    assert "cls_prob" not in out
    assert out["rois"].shape[1] == cfg.test.rpn_post_nms_top_n
