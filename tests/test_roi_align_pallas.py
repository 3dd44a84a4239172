"""Pallas RoI-align kernel vs the einsum reference path (interpret mode on
CPU): forward parity, backward (dF) parity, padding edges, and the
stop-gradient-on-rois contract of roi_align_batched."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_rcnn_pytorch_multimodal_tpu.ops.roi_align import (
    roi_align,
    roi_align_batched,
)
from faster_rcnn_pytorch_multimodal_tpu.ops.roi_align_pallas import (
    roi_align_batched_pallas,
)


def _mk(b=2, h=32, w=48, c=256, r=12, seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(b, h, w, c).astype(np.float32)
    x1 = rng.uniform(0, w * 8, (b, r))
    y1 = rng.uniform(0, h * 8, (b, r))
    rois = np.stack(
        [x1, y1, x1 + rng.uniform(8, w * 4, (b, r)), y1 + rng.uniform(8, h * 4, (b, r))],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(rois)


def _einsum_ref(feats, rois, scale, p=7):
    return jax.vmap(lambda f, r: roi_align(f, r, scale, output_size=p))(feats, rois)


def test_pallas_forward_matches_einsum():
    feats, rois = _mk()
    out_p = roi_align_batched_pallas(feats, rois, 1.0 / 8, 7, 2, False, True)
    out_e = _einsum_ref(feats, rois, 1.0 / 8)
    assert out_p.shape == out_e.shape
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_e), atol=2e-5)


def test_pallas_forward_unaligned_shapes():
    # r not a multiple of R_BLK, c not of C_BLK, w not of 16
    feats, rois = _mk(b=1, h=17, w=21, c=72, r=5, seed=3)
    out_p = roi_align_batched_pallas(feats, rois, 1.0 / 4, 7, 2, False, True)
    out_e = _einsum_ref(feats, rois, 1.0 / 4)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_e), atol=2e-5)


def test_pallas_backward_matches_einsum():
    feats, rois = _mk(b=1, h=16, w=24, c=128, r=8, seed=1)

    def loss_p(f):
        return jnp.sum(
            roi_align_batched_pallas(f, rois, 1.0 / 8, 7, 2, False, True) ** 2
        )

    def loss_e(f):
        return jnp.sum(_einsum_ref(f, jax.lax.stop_gradient(rois), 1.0 / 8) ** 2)

    gp = jax.grad(loss_p)(feats)
    ge = jax.grad(loss_e)(feats)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(ge), atol=1e-3, rtol=1e-3)


def test_batched_dispatch_stops_roi_gradient():
    feats, rois = _mk(b=1, h=16, w=16, c=128, r=4, seed=2)

    def loss(r):
        return jnp.sum(roi_align_batched(feats, r, 1.0 / 8, use_pallas=False))

    g = jax.grad(loss)(rois)
    # torchvision roi_align backward ignores rois
    np.testing.assert_array_equal(np.asarray(g), np.zeros_like(g))


def test_batched_dispatch_einsum_path():
    feats, rois = _mk(b=2, h=16, w=16, c=128, r=4, seed=4)
    out = roi_align_batched(feats, rois, 1.0 / 8, use_pallas=False)
    ref = _einsum_ref(feats, rois, 1.0 / 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
