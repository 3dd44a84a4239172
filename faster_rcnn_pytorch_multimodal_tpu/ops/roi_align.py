"""RoI Align (single-level + FPN multiscale) as pure XLA gathers.

Replaces torchvision.ops.roi_align / the torchvision-fork MultiScaleRoIAlign
(ref: lib/utils/torchpoolers.py:20-200; instantiated by the missing
network.py per cfg.POOLING_MODE, see SURVEY.md §2.1).

Design notes (TPU):
  * all sample coordinates for all (roi, bin, sample) triples are computed
    in one shot; bilinear interpolation is 4 batched gathers from the
    flattened feature map — XLA lowers these to efficient dynamic-gathers
    and fuses the weighting,
  * `sampling_ratio` is fixed (default 2) instead of torchvision's adaptive
    ceil(roi_size/out_size): adaptivity is a data-dependent shape, which XLA
    cannot trace.  At 7x7 outputs the difference is below detection noise.
  * FPN level assignment (LevelMapper, ref torchpoolers.py:20-51) is
    computed per-roi; every roi is pooled from every level and the right
    one is selected with a mask — 4x the gather work but branch-free.
    (A scalar-prefetch Pallas kernel is the planned upgrade.)
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = False,
) -> jnp.ndarray:
    """RoI Align one feature map.

    Args:
      features: (H, W, C) feature map (NHWC single frame).
      rois: (R, 4) boxes [x1, y1, x2, y2] in INPUT coordinates.
      spatial_scale: feature-map stride reciprocal (e.g. 1/16).
      output_size: pooled bins per side (cfg.POOLING_SIZE).
      sampling_ratio: bilinear samples per bin side.
      aligned: half-pixel offset (torchvision aligned=False default kept).

    Returns: (R, output_size, output_size, C)
    """
    h, w, c = features.shape
    r = rois.shape[0]
    p, sr = output_size, sampling_ratio

    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    roi_w = jnp.maximum(x2 - x1, 1.0 if not aligned else 0.0)
    roi_h = jnp.maximum(y2 - y1, 1.0 if not aligned else 0.0)
    bin_w = roi_w / p
    bin_h = roi_h / p

    # sample grid: (R, P, SR) per axis
    bin_idx = jnp.arange(p, dtype=jnp.float32)
    s_idx = (jnp.arange(sr, dtype=jnp.float32) + 0.5) / sr
    gx = (
        x1[:, None, None]
        + (bin_idx[None, :, None] + s_idx[None, None, :]) * bin_w[:, None, None]
    )
    gy = (
        y1[:, None, None]
        + (bin_idx[None, :, None] + s_idx[None, None, :]) * bin_h[:, None, None]
    )

    # full sample coordinate tensors: (R, P, SR, P, SR)
    yy = jnp.broadcast_to(gy[:, :, :, None, None], (r, p, sr, p, sr))
    xx = jnp.broadcast_to(gx[:, None, None, :, :], (r, p, sr, p, sr))

    out = _bilinear_gather(features, yy.reshape(r, -1), xx.reshape(r, -1))
    out = out.reshape(r, p, sr, p, sr, c).mean(axis=(2, 4))
    return out


def _bilinear_gather(
    features: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear sample (R, S) coordinate sets from (H, W, C) -> (R, S, C).

    Out-of-range coordinates clamp to the border (torchvision zeroes samples
    beyond [-1, dim]; at clipped-proposal scales the difference is confined
    to the outermost pixel row and is noise-level — documented waiver).
    """
    h, w, c = features.shape
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    wy1 = ys - y0
    wx1 = xs - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    flat = features.reshape(h * w, c)

    def g(yi, xi):
        idx = (yi * w + xi).astype(jnp.int32)
        return flat[idx]  # (R, S, C) gather

    v = (
        g(y0, x0) * (wy0 * wx0)[..., None]
        + g(y0, x1) * (wy0 * wx1)[..., None]
        + g(y1, x0) * (wy1 * wx0)[..., None]
        + g(y1, x1) * (wy1 * wx1)[..., None]
    )
    return v


@partial(
    jax.jit,
    static_argnames=(
        "strides",
        "output_size",
        "sampling_ratio",
        "canonical_scale",
        "canonical_level",
    ),
)
def multiscale_roi_align(
    feature_maps: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    strides: tuple,
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_scale: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN multiscale RoI align with the torchvision LevelMapper rule
    level = floor(canonical_level + log2(sqrt(area)/canonical_scale))
    (ref: lib/utils/torchpoolers.py:20-51,137-200).

    Args:
      feature_maps: list of (Hi, Wi, C), finest first (p2..p5).
      rois: (R, 4) in input coordinates.
      strides: (L,) feature strides, e.g. [4, 8, 16, 32].
    """
    num_levels = len(feature_maps)
    areas = jnp.maximum(
        (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 1e-6
    )
    lvl = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(areas) / canonical_scale + 1e-6)
    )
    lvl0 = canonical_level - (num_levels - 2)  # finest level id (2 for p2..p5)
    lvl = jnp.clip(lvl, lvl0, lvl0 + num_levels - 1) - lvl0  # 0..L-1

    out = None
    for i, fm in enumerate(feature_maps):
        pooled = roi_align(
            fm,
            rois,
            1.0 / float(strides[i]),
            output_size=output_size,
            sampling_ratio=sampling_ratio,
        )
        sel = (lvl == i).astype(pooled.dtype)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out
