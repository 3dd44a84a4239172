"""VGG16 backbone (ref lib/nets/vgg16.py:22-87).

Head = conv1_1..conv5_3 (stride 16, 512 ch); tail = fc6/fc7 (4096) over the
flattened 7x7 RoI.  The reference freezes the first 10 conv-layer params
(conv1_1..conv2_2 + pools, ref vgg16.py:41-43) — handled by the optimizer's
frozen mask on the `early` scope.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from faster_rcnn_pytorch_multimodal_tpu.models.resnet import CheapDropout

_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
        512, 512, 512)


class VGG16Head(nn.Module):
    """conv stack to stride 16 (no final pool, ref torchvision features[:-1])."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        conv_i = 0
        # first 4 convs (through conv2_2) live under 'early' so the
        # fixed-layer freeze can address them by path (ref vgg16.py:41-43)
        for spec in _CFG:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                scope = "early" if conv_i < 4 else "late"
                x = nn.Conv(
                    spec, (3, 3), padding=[(1, 1), (1, 1)],
                    name=f"{scope}_conv{conv_i}",
                )(x)
                x = nn.relu(x)
                conv_i += 1
        return x


class VGG16Tail(nn.Module):
    """fc6 -> fc7 (ref vgg16.py:55-60); input (R, 7, 7, 512)."""

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="fc6")(x))
        x = CheapDropout(0.5, name="drop6")(x, deterministic)
        x = nn.relu(nn.Dense(4096, name="fc7")(x))
        x = CheapDropout(0.5, name="drop7")(x, deterministic)
        return x
