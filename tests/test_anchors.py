"""Golden-value tests for anchor generation.

The golden matrix is the ACTUAL output of the reference python generator
(ref: lib/layer_utils/generate_anchors.py:41-105, executed).  Note it differs
by 1 px from the matlab numbers quoted in the reference's comment block
(:18-38) because numpy rounds half-to-even; we match the code, not the
comment, since checkpoints were trained with the code.
"""

import math

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.ops.anchors import (
    anchors_3d_to_bev_aabb,
    generate_3d_anchors,
    generate_anchors,
    generate_anchors_pre,
)

GOLDEN_BASE_ANCHORS = np.array(
    [
        [-84, -40, 99, 55],
        [-176, -88, 191, 103],
        [-360, -184, 375, 199],
        [-56, -56, 71, 71],
        [-120, -120, 135, 135],
        [-248, -248, 263, 263],
        [-36, -80, 51, 95],
        [-80, -168, 95, 183],
        [-168, -344, 183, 359],
    ],
    dtype=np.float64,
)


def test_generate_anchors_golden():
    a = generate_anchors(base_size=16, ratios=[0.5, 1, 2], scales=2 ** np.arange(3, 6))
    np.testing.assert_allclose(a, GOLDEN_BASE_ANCHORS)


def test_generate_anchors_pre_grid():
    anchors, n = generate_anchors_pre(
        height=2, width=3, feat_stride=16, anchor_scales=(8, 16, 32),
        anchor_ratios=(0.5, 1, 2),
    )
    assert n == 2 * 3 * 9
    assert anchors.shape == (n, 4)
    # first cell equals the base anchors
    np.testing.assert_allclose(anchors[:9], GOLDEN_BASE_ANCHORS)
    # second cell (x shift of 16)
    np.testing.assert_allclose(anchors[9:18], GOLDEN_BASE_ANCHORS + [16, 0, 16, 0])
    # second row (y shift of 16) starts at index W*A
    np.testing.assert_allclose(
        anchors[3 * 9 : 3 * 9 + 9], GOLDEN_BASE_ANCHORS + [0, 16, 0, 16]
    )


def test_generate_anchors_pre_frame_scale():
    a1, _ = generate_anchors_pre(2, 2, 16, (8,), (1,), frame_scale=1.0)
    a05, _ = generate_anchors_pre(2, 2, 16, (8,), (1,), frame_scale=0.5)
    w1 = a1[0, 2] - a1[0, 0]
    w05 = a05[0, 2] - a05[0, 0]
    assert w05 < w1  # anchors shrink with the frame scale


def test_generate_3d_anchors():
    h, w, stride = 4, 5, 16
    n, anchors = generate_3d_anchors(
        h, w, stride,
        anchor_sizes_lwh=((4.73, 2.08, 1.77),),
        anchor_rotations=(0.0, math.pi / 2),
        voxel_len=0.1,
    )
    # centers: every `stride` voxel over [0, W*stride-1) x [0, H*stride-1)
    n_x = len(np.arange(0, w * stride - 1, stride))
    n_y = len(np.arange(0, h * stride - 1, stride))
    assert n == n_x * n_y * 2
    assert anchors.shape == (n, 7)
    # sizes converted meters -> voxels (0.1 m/voxel => x10)
    np.testing.assert_allclose(anchors[0, 3:6], [47.3, 20.8, 1.77], rtol=1e-6)
    # z at half metric anchor height
    np.testing.assert_allclose(anchors[:, 2], 1.77 / 2, rtol=1e-6)
    # rotations alternate 0, pi/2 fastest
    np.testing.assert_allclose(anchors[0, 6], 0.0)
    np.testing.assert_allclose(anchors[1, 6], math.pi / 2)
    # ordering is y-major: anchor index n_x*2 advances y by stride
    np.testing.assert_allclose(anchors[n_x * 2, 1] - anchors[0, 1], stride)


def test_anchors_3d_bev_aabb_rotation_swap():
    anchors = np.array(
        [
            [10.0, 20.0, 1.0, 40.0, 20.0, 2.0, 0.0],
            [10.0, 20.0, 1.0, 40.0, 20.0, 2.0, math.pi / 2],
        ],
        dtype=np.float32,
    )
    aabb = anchors_3d_to_bev_aabb(anchors)
    np.testing.assert_allclose(aabb[0], [-10, 10, 30, 30])
    np.testing.assert_allclose(aabb[1], [0, 0, 20, 40])
