"""On-device BEV voxelizer vs hand-computed expectations
(semantics: ref lib/roi_data_layer/minibatch.py:445-516)."""

import numpy as np
import jax.numpy as jnp

from faster_rcnn_pytorch_multimodal_tpu.ops.voxelize import bev_grid_size, voxelize_bev
from faster_rcnn_pytorch_multimodal_tpu.config import default_config


def _vox(points, valid=None, num_x=8, num_y=8, num_slices=4):
    pts = jnp.asarray(points, jnp.float32)
    v = jnp.ones(len(points), bool) if valid is None else jnp.asarray(valid)
    return np.asarray(
        voxelize_bev(
            pts,
            v,
            x_range=(0.0, 8.0),
            y_range=(-4.0, 4.0),
            z_range=(-2.0, 2.0),
            voxel_len=1.0,
            voxel_height=1.0,
            num_x=num_x,
            num_y=num_y,
            num_slices=num_slices,
        )
    )


def test_voxelize_shapes_and_layout():
    bev = _vox([[0.5, -3.5, -1.2, 0.5, 0.1]])
    assert bev.shape == (8, 8, 7)  # (y, x, slices+3)
    # point at x=0.5 -> ix=0; y=-3.5 -> iy=0; z=-1.2 -> zs=0.8 -> slice 0
    assert bev[0, 0, 0] > 0  # height channel, y-major layout
    assert bev[:, :, 0].sum() == bev[0, 0, 0]


def test_voxelize_max_height_per_slice():
    # two points in the same voxel: max relative height wins
    bev = _vox([
        [2.5, 0.5, -0.9, 0.0, 0.0],   # zs=1.1 -> slice 1, rel 0.1
        [2.5, 0.5, -0.3, 0.0, 0.0],   # zs=1.7 -> slice 1, rel 0.7
    ])
    iy, ix = 4, 2
    np.testing.assert_allclose(bev[iy, ix, 1], 0.7, atol=1e-6)
    assert bev[iy, ix, 0] == 0  # slice 0 empty


def test_voxelize_density_and_intensity():
    pts = [[1.5, 1.5, -1.5, 0.8, 0.2]] * 16  # 16 pts in one voxel
    bev = _vox(pts)
    iy, ix = 5, 1
    np.testing.assert_allclose(bev[iy, ix, 4], 16 / 32, atol=1e-6)  # density
    np.testing.assert_allclose(bev[iy, ix, 5], np.tanh(0.8), atol=1e-5)
    np.testing.assert_allclose(bev[iy, ix, 6], np.tanh(0.2), atol=1e-5)


def test_voxelize_ignores_invalid_and_out_of_range():
    pts = [
        [1.5, 1.5, -1.5, 0.8, 0.2],
        [100.0, 0.0, 0.0, 1.0, 1.0],   # out of range
        [1.5, 1.5, -1.5, 0.8, 0.2],    # masked out
    ]
    bev = _vox(pts, valid=[True, True, False])
    np.testing.assert_allclose(bev[5, 1, 4], 1 / 32, atol=1e-6)
    assert bev.sum() == bev[5, 1].sum()


def test_bev_grid_size_scaling():
    cfg = default_config()
    ny, nx, ch = bev_grid_size(cfg, 1.0)
    assert (ny, nx, ch) == (800, 700, 15)
    ny2, nx2, _ = bev_grid_size(cfg, 0.5)
    assert (ny2, nx2) == (400, 350)
