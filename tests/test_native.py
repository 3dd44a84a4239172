"""Native C++ point-cloud ops: build, bind, and match numpy semantics."""

import numpy as np
import pytest

from faster_rcnn_pytorch_multimodal_tpu import native


@pytest.fixture(scope="module")
def pts():
    rng = np.random.RandomState(0)
    return np.hstack(
        [
            rng.uniform(0, 70, (5000, 1)),
            rng.uniform(-40, 40, (5000, 1)),
            rng.uniform(-3, 3, (5000, 1)),
            rng.uniform(0, 1, (5000, 2)),
        ]
    ).astype(np.float32)


def test_native_builds():
    assert native.available(), "libpc_ops.so failed to build (g++ required)"


def test_range_filter_matches_numpy(pts):
    bounds = np.array([0, 50, -20, 20, -2, 2], np.float32)
    out = native.pc_range_filter(pts, bounds)
    m = (
        (pts[:, 0] >= 0) & (pts[:, 0] <= 50)
        & (pts[:, 1] >= -20) & (pts[:, 1] <= 20)
        & (pts[:, 2] >= -2) & (pts[:, 2] <= 2)
    )
    expect = pts[m]
    assert out.shape == expect.shape
    np.testing.assert_allclose(out, expect)


def test_rotate_and_flips_exact(pts):
    ang = 0.7
    out = native.pc_rotate_z(pts, ang)
    c, s = np.cos(ang), np.sin(ang)
    np.testing.assert_allclose(out[:, 0], pts[:, 0] * c - pts[:, 1] * s, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(out[:, 1], pts[:, 0] * s + pts[:, 1] * c, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(out[:, 2:], pts[:, 2:])

    fy = native.pc_flip_y(pts)
    np.testing.assert_allclose(fy[:, 1], -pts[:, 1])
    fx = native.pc_flip_x(pts, 70.0)
    np.testing.assert_allclose(fx[:, 0], -pts[:, 0] + 70.0)
    sw = native.pc_swap_xy(pts, -40.0, 35.0)
    np.testing.assert_allclose(sw[:, 0], pts[:, 1] + 40.0)
    np.testing.assert_allclose(sw[:, 1], pts[:, 0] - 35.0)


def test_dropout_statistics(pts):
    out = native.pc_dropout(pts, 0.85, seed=42)
    frac = len(out) / len(pts)
    assert 0.80 < frac < 0.90
    # deterministic for a fixed seed
    out2 = native.pc_dropout(pts, 0.85, seed=42)
    np.testing.assert_allclose(out, out2)
    out3 = native.pc_dropout(pts, 0.85, seed=43)
    assert len(out3) != len(out) or not np.allclose(out3, out)


def test_gauss_distort_statistics(pts):
    out = native.pc_gauss_distort(pts, [0.05, 0.05, 0.03], seed=7)
    d = out[:, :3] - pts[:, :3]
    assert abs(d[:, 0].std() - 0.05) < 0.01
    assert abs(d[:, 2].std() - 0.03) < 0.01
    np.testing.assert_allclose(out[:, 3:], pts[:, 3:])


def test_rain_sim_behaviour(pts):
    out = native.pc_rain_sim(pts, rain_rate=8.0, max_range=80.0, seed=3)
    assert len(out) < len(pts)          # far returns drop below noise floor
    assert out[:, 3].mean() < pts[:, 3].mean()  # intensity attenuated
