"""TF-free golden tests for the Waymo range-image -> point-cloud math.

Strategy: build a synthetic range image by INVERSE-mapping known 3D
points (pick the pixel from the point's azimuth/inclination, store its
range), run utils/waymo_range_image.py forward, and assert the known
points come back — through a nontrivial extrinsic and, for the TOP-lidar
path, per-pixel poses.  This is the reference's vendored TF pipeline
(ref tools/waymo_unpack_combined.py:374-494) with no TF in the loop.
"""

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.utils.waymo_range_image import (
    compute_inclination,
    extract_point_cloud_from_range_image,
    pixel_pose_transform,
    range_image_to_point_cloud,
)


def _make_extrinsic(yaw=0.0, t=(0.0, 0.0, 0.0)):
    e = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    e[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    e[:3, 3] = t
    return e


def _inverse_fill(points_sensor, h, w, incl, az_correction=0.0):
    """Known sensor-frame points -> range image (inverse of the forward
    azimuth convention incl. the extrinsic-yaw correction)."""
    ri = np.zeros((h, w))
    for p in points_sensor:
        r = np.linalg.norm(p)
        az = np.arctan2(p[1], p[0])
        inc = np.arcsin(p[2] / r)
        # az = (1 - 2*(col+0.5)/w)*pi - az_correction
        col = int(np.round((1 - (az + az_correction) / np.pi) * w / 2 - 0.5)) % w
        row = int(np.argmin(np.abs(incl - inc)))
        ri[row, col] = r
    return ri


def test_compute_inclination_matches_waymo_contract():
    inc = compute_inclination(-0.3, 0.2, 5)
    assert inc.shape == (5,)
    np.testing.assert_allclose(inc[0], -0.3 + 0.5 / 5 * 0.5)
    np.testing.assert_allclose(np.diff(inc), 0.5 / 5)
    assert inc[0] < inc[-1], "lowest -> highest"


def test_round_trip_identity_extrinsic():
    """Points snapped to exact pixel centers reconstruct exactly."""
    h, w = 64, 2650
    incl_lo_hi = compute_inclination(-0.3, 0.2, h)
    incl = incl_lo_hi[::-1]  # row 0 = highest beam
    # choose pixel centers directly: (row, col) -> expected point
    rows = np.array([3, 17, 40, 63])
    cols = np.array([10, 700, 1325, 2600])
    ranges = np.array([5.0, 20.0, 42.0, 70.0])
    ri = np.zeros((h, w))
    ri[rows, cols] = ranges
    az = (1 - 2 * (cols + 0.5) / w) * np.pi
    expect = np.stack(
        [
            np.cos(az) * np.cos(incl[rows]) * ranges,
            np.sin(az) * np.cos(incl[rows]) * ranges,
            np.sin(incl[rows]) * ranges,
        ],
        axis=-1,
    )
    pts = extract_point_cloud_from_range_image(ri, np.eye(4), incl)
    got = pts[rows, cols]
    np.testing.assert_allclose(got, expect, atol=1e-9)


def test_extrinsic_yaw_and_translation():
    """A yawed+translated sensor must return points in the VEHICLE frame:
    forward-fire a beam and check it lands where the vehicle-frame
    geometry says, including the azimuth correction."""
    h, w = 32, 1024
    incl = compute_inclination(-0.1, 0.1, h)[::-1]
    yaw = 0.7
    ext = _make_extrinsic(yaw=yaw, t=(1.5, -0.5, 2.0))

    # vehicle-frame target point
    target = np.array([10.0, 4.0, 2.5])
    # sensor frame coords
    p_s = ext[:3, :3].T @ (target - ext[:3, 3])
    az_corr = np.arctan2(ext[1, 0], ext[0, 0])
    ri = _inverse_fill([p_s], h, w, incl, az_correction=az_corr)
    pts = range_image_to_point_cloud(ri, ext, incl)
    assert pts.shape == (1, 3)
    # pixel quantization: az step ~0.35 deg, incl step ~0.36 deg at r~11
    np.testing.assert_allclose(pts[0], target, atol=0.12)


def test_pixel_pose_identity_matches_plain_path():
    h, w = 16, 256
    incl = compute_inclination(-0.2, 0.2, h)[::-1]
    rs = np.random.RandomState(0)
    ri = np.where(rs.rand(h, w) < 0.2, rs.uniform(3, 60, (h, w)), 0.0)
    ext = _make_extrinsic(yaw=0.3, t=(1.0, 0.0, 2.0))

    plain = range_image_to_point_cloud(ri, ext, incl)
    pose6 = np.zeros((h, w, 6))
    pixel_pose = pixel_pose_transform(pose6)  # identity everywhere
    frame_pose = np.eye(4)
    with_pose = range_image_to_point_cloud(
        ri, ext, incl, pixel_pose=pixel_pose, frame_pose=frame_pose
    )
    np.testing.assert_allclose(with_pose, plain, atol=1e-9)


def test_pixel_pose_rolling_shutter_correction():
    """A constant per-pixel pose equal to the frame pose must cancel
    exactly; a DIFFERENT per-pixel pose must shift points by the relative
    motion (the TOP-lidar rolling-shutter semantics)."""
    h, w = 8, 128
    incl = compute_inclination(-0.2, 0.2, h)[::-1]
    rs = np.random.RandomState(1)
    ri = np.where(rs.rand(h, w) < 0.3, rs.uniform(3, 40, (h, w)), 0.0)
    ext = np.eye(4)

    # frame pose: vehicle somewhere in global coords
    yaw = 0.5
    frame_pose = _make_extrinsic(yaw=yaw, t=(100.0, -50.0, 3.0))
    pose6 = np.zeros((h, w, 6))
    pose6[..., 2] = yaw
    pose6[..., 3:] = [100.0, -50.0, 3.0]
    pixel_pose = pixel_pose_transform(pose6)
    same = range_image_to_point_cloud(
        ri, ext, incl, pixel_pose=pixel_pose, frame_pose=frame_pose
    )
    plain = range_image_to_point_cloud(ri, ext, incl)
    np.testing.assert_allclose(same, plain, atol=1e-4)  # f32 outputs

    # vehicle moved +2 m in global x between pixel time and frame time
    pose6_moved = pose6.copy()
    pose6_moved[..., 3] += 2.0
    moved = range_image_to_point_cloud(
        ri, ext, incl,
        pixel_pose=pixel_pose_transform(pose6_moved), frame_pose=frame_pose,
    )
    # global +2x maps back through frame_pose^-1: rotated into vehicle frame
    delta = frame_pose[:3, :3].T @ np.array([2.0, 0.0, 0.0])
    np.testing.assert_allclose(moved - plain,
                               np.broadcast_to(delta, plain.shape), atol=1e-4)


def test_features_and_masking():
    h, w = 4, 16
    incl = compute_inclination(-0.1, 0.1, h)[::-1]
    ri = np.zeros((h, w))
    ri[1, 3] = 10.0
    ri[2, 8] = 25.0
    intensity = np.full((h, w), 0.7)
    elongation = np.full((h, w), 0.2)
    out = range_image_to_point_cloud(
        ri, np.eye(4), incl, intensity=intensity, elongation=elongation
    )
    assert out.shape == (2, 5)
    np.testing.assert_allclose(out[:, 3], 0.7)
    np.testing.assert_allclose(out[:, 4], 0.2)
    np.testing.assert_allclose(np.linalg.norm(out[:, :3], axis=1), [10.0, 25.0],
                               rtol=1e-6)
