"""MobileNetV1 backbone (ref lib/nets/mobilenet_v1.py:52-293).

Depthwise-separable stack with a depth multiplier; head = layers 0-11
(stride 16), tail = layers 12-13 (ref :267-270).  Depthwise kernels get
their own weight-decay tag in the reference (:254-264) — mirrored by the
optimizer's path-based decay mask matching 'depthwise'.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# (stride, out_channels) per separable block after the initial full conv
_BLOCKS = [
    (1, 64), (2, 128), (1, 128), (2, 256), (1, 256), (2, 512),
    (1, 512), (1, 512), (1, 512), (1, 512), (1, 512),  # layers 1-11
]
_TAIL_BLOCKS = [(2, 1024), (1, 1024)]  # layers 12-13


def _depth(ch: int, mult: float) -> int:
    return max(int(ch * mult), 8)


class _SepConv(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], feature_group_count=in_ch,
            use_bias=False, name="depthwise",
        )(x)
        from faster_rcnn_pytorch_multimodal_tpu.models.resnet import FrozenBatchNorm

        x = FrozenBatchNorm(in_ch, name="dw_bn")(x)
        x = nn.relu6(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="pointwise")(x)
        x = FrozenBatchNorm(self.features, name="pw_bn")(x)
        return nn.relu6(x)


class MobileNetV1Head(nn.Module):
    depth_multiplier: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from faster_rcnn_pytorch_multimodal_tpu.models.resnet import FrozenBatchNorm

        m = self.depth_multiplier
        x = nn.Conv(
            _depth(32, m), (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, name="conv0",
        )(x)
        x = FrozenBatchNorm(_depth(32, m), name="bn0")(x)
        x = nn.relu6(x)
        for i, (stride, ch) in enumerate(_BLOCKS):
            x = _SepConv(_depth(ch, m), stride, name=f"layer{i + 1}")(x)
        return x


class MobileNetV1Tail(nn.Module):
    """layers 12-13 over pooled RoIs -> global pool (ref :232-252)."""

    depth_multiplier: float = 1.0

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = pooled
        m = self.depth_multiplier
        for i, (stride, ch) in enumerate(_TAIL_BLOCKS):
            x = _SepConv(_depth(ch, m), 1, name=f"layer{i + 12}")(x)
        return jnp.mean(x, axis=(1, 2))
