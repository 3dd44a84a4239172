"""Feature Pyramid Network (ref lib/nets/fpn.py:23-68).

Quirk replicated on purpose: the reference applies the 3x3 anti-alias conv
only to p2 and p3 — aalayer4 is constructed and initialized but never used
in forward (ref fpn.py:39 vs :56-68).  We keep the unused parameters so a
converted checkpoint round-trips exactly.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_to(x: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize (align_corners=False), matching F.interpolate
    (ref fpn.py:42-45)."""
    b, _, _, c = x.shape
    return jax.image.resize(
        x, (b, target_hw[0], target_hw[1], c), method="bilinear"
    )


class FPN(nn.Module):
    planes: int = 256

    @nn.compact
    def __call__(
        self,
        c2: jnp.ndarray,
        c3: jnp.ndarray,
        c4: jnp.ndarray,
        c5: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        lat = lambda n: nn.Conv(self.planes, (1, 1), name=n)
        aa = lambda n: nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)], name=n)

        p5 = lat("latlayer5")(c5)
        p4 = _upsample_to(p5, c4.shape[1:3]) + lat("latlayer4")(c4)
        p3 = _upsample_to(p4, c3.shape[1:3]) + lat("latlayer3")(c3)
        p3 = aa("aalayer3")(p3)
        p2 = _upsample_to(p3, c2.shape[1:3]) + lat("latlayer2")(c2)
        p2 = aa("aalayer2")(p2)

        # dead parameters kept for checkpoint-shape parity (see module doc)
        _ = aa("aalayer4")(jnp.zeros_like(p4[:, :1, :1, :]))

        return p2, p3, p4, p5
