"""RoI align vs a numpy bilinear oracle; loss functions vs the reference
formulas (lib/utils/loss_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.ops.roi_align import roi_align, multiscale_roi_align
from faster_rcnn_pytorch_multimodal_tpu.ops.losses import (
    bayesian_cross_entropy,
    categorical_entropy,
    categorical_mutual_information,
    compute_bbox_var,
    cross_entropy,
    huber_loss,
    smooth_l1_loss,
)


def test_roi_align_constant_feature():
    feat = jnp.ones((32, 32, 8)) * 3.5
    rois = jnp.array([[16.0, 16.0, 200.0, 120.0]])
    out = roi_align(feat, rois, 1.0 / 16.0, output_size=7)
    assert out.shape == (1, 7, 7, 8)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-6)


def test_roi_align_linear_ramp():
    # f(x, y) = x: bilinear sampling of a linear field is exact, so each
    # pooled bin equals the mean of its sample x-coordinates
    h = w = 64
    xs = np.arange(w, dtype=np.float32)
    feat = np.broadcast_to(xs[None, :, None], (h, w, 1)).copy()
    rois = np.array([[80.0, 64.0, 400.0, 320.0]], np.float32)  # /16 -> [5, 4, 25, 20]
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16.0, 7, 2))
    x1, roi_w = 5.0, 20.0
    bin_w = roi_w / 7
    for px in range(7):
        expect = x1 + (px + 0.5) * bin_w  # mean of the two samples in the bin
        np.testing.assert_allclose(out[0, :, px, 0], expect, rtol=1e-5)


def test_multiscale_roi_align_level_routing():
    # constant-valued maps: output equals the value of the level the roi maps to
    fms = [jnp.full((64 // s, 64 // s, 4), float(i)) for i, s in enumerate([1, 2, 4, 8])]
    strides = (4, 8, 16, 32)
    # tiny roi -> p2 (value 0); huge roi -> p5 (value 3)
    rois = jnp.array([[0.0, 0.0, 32.0, 32.0], [0.0, 0.0, 800.0, 800.0]])
    out = np.asarray(multiscale_roi_align(fms, rois, strides))
    np.testing.assert_allclose(out[0], 0.0, atol=1e-5)
    np.testing.assert_allclose(out[1], 3.0, atol=1e-5)


def test_huber_matches_reference_formula():
    pred = jnp.asarray(np.linspace(-3, 3, 25, dtype=np.float32))
    tgt = jnp.zeros(25)
    out = np.asarray(huber_loss(pred, tgt, 1.0))
    x = np.linspace(-3, 3, 25)
    expect = np.where(np.abs(x) < 1.0, 0.5 * x**2, np.abs(x) - 0.5)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_smooth_l1_masks_and_normalizes():
    n = 8
    pred = jnp.ones((n, 4)) * 2.0
    tgt = jnp.zeros((n, 4))
    iw = jnp.zeros((n, 4)).at[:2].set(1.0)
    ow = jnp.full((n, 4), 1.0 / n)
    loss = float(smooth_l1_loss(pred, tgt, iw, ow))
    # per fg elem huber(2)=1.5; rows 0-1 contribute 4*1.5/n each; mean over n rows
    expect = (2 * (4 * 1.5 / n)) / n
    np.testing.assert_allclose(loss, expect, rtol=1e-5)


def test_smooth_l1_aleatoric_attenuation():
    pred = jnp.ones((4, 4))
    tgt = jnp.zeros((4, 4))
    iw = jnp.ones((4, 4))
    ow = jnp.ones((4, 4))
    var = jnp.zeros((4, 4))  # s=0 -> 0.5*L
    base = float(smooth_l1_loss(pred, tgt, iw, ow))
    att = float(smooth_l1_loss(pred, tgt, iw, ow, bbox_var=var))
    np.testing.assert_allclose(att, 0.5 * base, rtol=1e-5)


def test_smooth_l1_lidar_ry_sin():
    # heading residual of pi should produce ~zero loss with sin enabled
    pred = jnp.zeros((2, 7)).at[:, 6].set(np.pi)
    tgt = jnp.zeros((2, 7))
    iw = jnp.ones((2, 7))
    ow = jnp.ones((2, 7))
    loss_sin = float(smooth_l1_loss(pred, tgt, iw, ow, lidar_det=True, en_ry_sin=True))
    loss_nosin = float(smooth_l1_loss(pred, tgt, iw, ow, lidar_det=True, en_ry_sin=False))
    assert loss_sin < 1e-5
    assert loss_nosin > 1.0


def test_compute_bbox_var():
    rng = np.random.RandomState(0)
    x = rng.normal(size=(10, 6, 4)).astype(np.float32)
    got = np.asarray(compute_bbox_var(jnp.asarray(x)))
    np.testing.assert_allclose(got, x.var(axis=0, ddof=1), rtol=1e-3, atol=1e-5)


def test_entropy_and_mutual_information():
    # uniform probs -> entropy = log2(C); identical samples -> MI ~= 0
    p = jnp.full((3, 4), 0.25)
    np.testing.assert_allclose(np.asarray(categorical_entropy(p)), 2.0, rtol=1e-5)
    logits = jnp.asarray(np.random.RandomState(1).normal(size=(1, 5, 4)))
    samples = jnp.tile(logits, (7, 1, 1))
    mi = np.asarray(categorical_mutual_information(samples))
    np.testing.assert_allclose(mi, 0.0, atol=1e-5)


def test_bayesian_ce_approaches_plain_ce_at_zero_var():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.normal(size=(16, 5)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, 16))
    var = jnp.full((16, 5), 1e-10)
    bce, mi = bayesian_cross_entropy(logits, var, labels, 64, jax.random.PRNGKey(0))
    ce = cross_entropy(logits, labels)
    np.testing.assert_allclose(float(bce), float(ce), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mi), 0.0, atol=1e-3)


def test_cross_entropy_weighted_ignores_masked():
    logits = jnp.asarray(np.random.RandomState(3).normal(size=(6, 3)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 0, 1, 2])
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    full = cross_entropy(logits[:3], labels[:3])
    masked = cross_entropy(logits, labels, weights=w)
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)
