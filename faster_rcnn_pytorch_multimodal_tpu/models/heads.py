"""RPN head and second-stage detection head (with uncertainty variants).

These are the learned modules the reference builds inside the missing
network.py (surface reconstructed in SURVEY.md §2.1 from
ref imagenet.py:66-91 / lidarnet.py:70-102):

  rpn_net (3x3 conv -> RPN_CHANNELS) -> rpn_cls_score_net (1x1, 2A),
                                        rpn_bbox_pred_net (1x1, 4A)
  _head_to_tail -> fc7 -> cls_score_net (K), bbox_pred_net (E*K)
  aleatoric:  bbox_al_var_net (E*K), cls_al_var_net (K)
  epistemic:  {cls,bbox}_fc1 -> drop -> fc2 -> drop stacks feeding the
              predictors, with BN variants for lidar (lidarnet.py:85-92)

Init follows ref imagenet.py:65-91: normal(0, 0.01) for heads,
normal(0, 0.001) for bbox_pred / bbox_al_var.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from faster_rcnn_pytorch_multimodal_tpu.models.resnet import (
    CheapDropout,
    FrozenBatchNorm,
)


def _normal(std: float):
    return nn.initializers.normal(stddev=std)


class RPNHead(nn.Module):
    """3x3 conv + twin 1x1 predictors over the RPN feature map."""

    rpn_channels: int = 512
    num_anchors: int = 25

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(
            self.rpn_channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=_normal(0.01),
            name="rpn_net",
        )(feat)
        x = nn.relu(x)
        cls = nn.Conv(
            self.num_anchors * 2, (1, 1), kernel_init=_normal(0.01),
            name="rpn_cls_score_net",
        )(x)
        bbox = nn.Conv(
            self.num_anchors * 4, (1, 1), kernel_init=_normal(0.01),
            name="rpn_bbox_pred_net",
        )(x)
        return cls, bbox


class FCTail(nn.Module):
    """Custom 3-FC tail for FPN-pooled RoIs (t_fc1/2/3, ref imagenet.py:70-73).

    The reference gates it behind ENABLE_CUSTOM_TAIL; with multiscale
    pooling the 256x7x7 RoI tensor has to reach fc7_channels somehow and
    this is the only tail wired for it, so it is the FPN default here.
    """

    fc7_channels: int = 2048

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc7_channels, kernel_init=_normal(0.01), name="t_fc1")(x))
        x = nn.relu(nn.Dense(self.fc7_channels, kernel_init=_normal(0.01), name="t_fc2")(x))
        x = nn.relu(nn.Dense(self.fc7_channels, kernel_init=_normal(0.01), name="t_fc3")(x))
        return x


class EpistemicStack(nn.Module):
    """fc1 -> drop -> fc2 -> drop (+ optional BN, lidar) feeding a predictor.

    The dropout layers stay LIVE at eval time for MC sampling — pass
    deterministic=False and distinct 'dropout' rngs per sample
    (replaces the reference's set_e_num_sample loop, ref imagenet.py:165-172).
    """

    features: int
    drop_rate: float
    batchnorm_en: bool = False
    prefix: str = "cls"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.features, kernel_init=_normal(0.01), name=f"{self.prefix}_fc1")(x)
        if self.batchnorm_en:
            x = FrozenBatchNorm(self.features, name=f"{self.prefix}_bn1")(x)
        x = nn.relu(x)
        x = CheapDropout(self.drop_rate, name=f"{self.prefix}_drop1")(x, deterministic)
        x = nn.Dense(self.features, kernel_init=_normal(0.01), name=f"{self.prefix}_fc2")(x)
        if self.batchnorm_en:
            x = FrozenBatchNorm(self.features, name=f"{self.prefix}_bn2")(x)
        x = nn.relu(x)
        x = CheapDropout(self.drop_rate, name=f"{self.prefix}_drop2")(x, deterministic)
        return x


class DetectionPredictors(nn.Module):
    """fc7 -> class scores / box deltas / aleatoric log-variances."""

    num_classes: int
    num_bbox_elem: int
    det_channels: int
    cls_drop_rate: float = 0.3
    bbox_drop_rate: float = 0.1
    en_cls_aleatoric: bool = False
    en_bbox_aleatoric: bool = False
    en_cls_epistemic: bool = False
    en_bbox_epistemic: bool = False
    lidar_bn: bool = False

    @nn.compact
    def __call__(
        self, fc7: jnp.ndarray, deterministic: bool = True
    ) -> dict:
        k = self.num_classes
        ek = self.num_bbox_elem * k

        cls_in = fc7
        if self.en_cls_epistemic:
            cls_in = EpistemicStack(
                self.det_channels,
                self.cls_drop_rate,
                batchnorm_en=self.lidar_bn,
                prefix="cls",
            )(fc7, deterministic)
        bbox_in = fc7
        if self.en_bbox_epistemic:
            bbox_in = EpistemicStack(
                self.det_channels,
                self.bbox_drop_rate,
                batchnorm_en=self.lidar_bn,
                prefix="bbox",
            )(fc7, deterministic)

        out = {
            "cls_score": nn.Dense(k, kernel_init=_normal(0.01), name="cls_score_net")(
                cls_in
            ),
            "bbox_pred": nn.Dense(
                ek, kernel_init=_normal(0.001), name="bbox_pred_net"
            )(bbox_in),
        }
        if self.en_cls_aleatoric:
            out["cls_al_var"] = nn.Dense(
                k, kernel_init=_normal(0.01), name="cls_al_var_net"
            )(cls_in)
        if self.en_bbox_aleatoric:
            out["bbox_al_var"] = nn.Dense(
                ek, kernel_init=_normal(0.001), name="bbox_al_var_net"
            )(bbox_in)
        return out
