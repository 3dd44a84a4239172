"""Don't-care end-to-end wiring + image augmentation parity tests
(VERDICT round-1 items 3/8: ref proposal_target_layer.py:184-194,
minibatch.py:563-597, 614-646, 648-664)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_rcnn_pytorch_multimodal_tpu.config import Config
from faster_rcnn_pytorch_multimodal_tpu.data import augment as aug
from faster_rcnn_pytorch_multimodal_tpu.data.db_base import _bev_aabb_of_7dof
from faster_rcnn_pytorch_multimodal_tpu.data.loader import BatchLoader
from faster_rcnn_pytorch_multimodal_tpu.ops.targets import proposal_target


def _pt(rois, gt, dc, dc_mask, ignore_dc, seed=0):
    r = rois.shape[0]
    return proposal_target(
        jnp.asarray(rois),
        jnp.ones((r,)),
        jnp.ones((r,), bool),
        jnp.zeros((r, 7)),
        jnp.asarray(gt),
        jnp.ones((gt.shape[0],), bool),
        jnp.zeros((gt.shape[0], 8)),
        jnp.asarray(dc),
        jnp.asarray(dc_mask),
        jax.random.PRNGKey(seed),
        jnp.zeros((4,)),
        jnp.ones((4,)),
        num_classes=2,
        roi_batch_size=16,
        fg_thresh=0.5,
        bg_thresh_hi=0.5,
        ignore_dc=ignore_dc,
        dc_thresh=0.5,
    )


def test_dc_region_changes_sampled_rois():
    """A detection-sized dc region must remove the overlapping proposal from
    the fg sample pool when TRAIN.IGNORE_DC is on."""
    # proposal 0 sits exactly on the (single) GT box AND on a dc region;
    # the rest are far-away background
    gt = np.array([[10, 10, 50, 50, 1.0]], np.float32)
    rois = np.zeros((8, 5), np.float32)
    rois[0, 1:] = [10, 10, 50, 50]  # only fg candidate
    for i in range(1, 8):
        rois[i, 1:] = [100 + 10 * i, 100, 130 + 10 * i, 130]
    dc = np.array([[8, 8, 52, 52]], np.float32)
    dc_mask = np.ones((1,), bool)

    off = _pt(rois, gt, dc, dc_mask, ignore_dc=False)
    assert int(jnp.sum(off.labels > 0)) > 0, "sanity: fg sampled without dc"

    on = _pt(rois, gt, dc, dc_mask, ignore_dc=True)
    assert int(jnp.sum(on.labels > 0)) == 0, "dc-overlapped roi must not be fg"
    # the suppressed roi's coordinates must not appear in the sample at all
    sampled = np.asarray(on.rois[np.asarray(on.valid)])
    assert not np.any(np.all(np.isclose(sampled[:, 1:], [10, 10, 50, 50]), axis=1))


def _fake_image_ds(n=4, with_dc=True):
    class DS:
        def __len__(self):
            return n

        def frame(self, i, augment=False, rng=None, scale=None):
            f = {
                "data": np.zeros((64, 96, 3), np.float32),
                "gt_boxes": np.array([[4, 4, 20, 20, 1.0]], np.float32),
                "window": np.array([0, 96, 0, 64], np.float32),
            }
            if with_dc:
                f["gt_boxes_dc"] = np.array(
                    [[30 + i, 30, 60, 60]], np.float32
                )
            return f

    return DS()


def test_loader_packs_dc_boxes():
    from dataclasses import replace

    cfg = replace(Config(), net_type="image")
    loader = BatchLoader(_fake_image_ds(), cfg, batch_size=2, augment=False, shuffle=False)
    batch = loader.next()
    assert batch["gt_boxes_dc"].shape == (2, cfg.static.max_gt_dc, 4)
    assert batch["dc_mask"].shape == (2, cfg.static.max_gt_dc)
    assert batch["dc_mask"][0, 0] and not batch["dc_mask"][0, 1]
    np.testing.assert_allclose(batch["gt_boxes_dc"][0, 0], [30, 30, 60, 60])


def test_loader_dc_defaults_empty():
    from dataclasses import replace

    cfg = replace(Config(), net_type="image")
    loader = BatchLoader(
        _fake_image_ds(with_dc=False), cfg, batch_size=2, augment=False, shuffle=False
    )
    batch = loader.next()
    assert not batch["dc_mask"].any()


def test_affine_boxes_follow_image():
    """Box corners transformed with the same affine as the pixels: the
    post-warp bright-pixel extent must sit inside the transformed box."""
    import cv2

    img = np.zeros((80, 120, 3), np.float32)
    box = np.array([[30.0, 20.0, 70.0, 50.0]], np.float32)
    img[20:51, 30:71] = 255.0

    p = {"scale": (1.15, 0.95), "translate": (0.04, -0.03), "shear": 0.05, "cval": 0}
    m = aug._affine_matrix(p, 120, 80)
    warped = cv2.warpAffine(img, m, (120, 80), flags=cv2.INTER_NEAREST)
    tb = aug._transform_boxes_affine(box, m)[0]

    ys, xs = np.where(warped[..., 0] > 128)
    assert len(xs) > 0
    # enclosing AABB of the warped pixels == transformed box (±1.5 px)
    assert abs(xs.min() - tb[0]) <= 1.5 and abs(xs.max() - tb[2]) <= 1.5
    assert abs(ys.min() - tb[1]) <= 1.5 and abs(ys.max() - tb[3]) <= 1.5


def test_image_augment_pipeline_runs_and_clips():
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 255, (64, 96, 3)).astype(np.float32)
    boxes = np.array([[10, 10, 40, 40], [50, 20, 90, 60]], np.float32)
    dc = np.array([[5, 5, 15, 15]], np.float32)
    for seed in range(6):  # exercise every random branch
        r = np.random.RandomState(seed)
        out, b, d = aug.image_augment_pipeline(img, boxes, dc, r)
        assert out.shape == img.shape
        assert out.min() >= 0 and out.max() <= 255
        assert b.shape == boxes.shape and d.shape == dc.shape


def test_clip_and_ignore_rules():
    h, w = 100, 100
    boxes = np.array(
        [
            [10, 10, 50, 50],  # fine
            [-40, 10, -5, 50],  # fully outside -> clipped to sliver -> ignore
            [90, 10, 200, 50],  # clipped width < 10% of original -> ignore
            [10, 98.5, 50, 99.9],  # height < 2 px -> ignore
        ],
        np.float32,
    )
    ig = np.zeros(4, bool)
    out, ig2 = aug.clip_and_ignore_boxes(boxes, ig, w, h)
    assert not ig2[0]
    assert ig2[1] and ig2[2] and ig2[3]
    assert out[:, 0].min() >= 0 and out[:, 2].max() <= w - 1


def test_weather_corrupt_changes_pixels():
    rng = np.random.RandomState(1)
    img = np.full((64, 64, 3), 128.0, np.float32)
    out = aug.weather_corrupt(img, rng)
    assert out.shape == img.shape
    assert np.abs(out - img).max() > 10  # splotches visible
    assert out.min() >= 0 and out.max() <= 255


def test_bev_aabb_numpy_matches_jnp():
    from faster_rcnn_pytorch_multimodal_tpu.ops.iou import bbox_3d_to_bev_aabb

    rs = np.random.RandomState(2)
    b7 = np.zeros((12, 7), np.float32)
    b7[:, 0:2] = rs.uniform(0, 100, (12, 2))
    b7[:, 3:5] = rs.uniform(2, 10, (12, 2))
    b7[:, 6] = rs.uniform(-np.pi, np.pi, 12)
    np.testing.assert_allclose(
        _bev_aabb_of_7dof(b7), np.asarray(bbox_3d_to_bev_aabb(jnp.asarray(b7))),
        rtol=1e-5, atol=1e-5,
    )


def test_lidar_dc_rides_augmentation():
    """dc boxes go through the same geometric transforms as GT boxes."""
    from faster_rcnn_pytorch_multimodal_tpu.data.db_base import DetectionDB

    class LidarDS(DetectionDB):
        _classes = ("dontcare", "car")
        type = "lidar"

        def __init__(self, cfg):
            self.name = "fake"
            self.cfg = cfg
            self.mode = "train"
            self._rng = np.random.RandomState(0)
            self._roidb = [
                {
                    "filename": "x",
                    "boxes": np.array([[10, 0, -1, 4, 2, 1.5, 0.3]], np.float32),
                    "boxes_dc": np.array([[20, 5, -1, 4, 2, 1.5, 1.0]], np.float32),
                    "gt_classes": np.array([1], np.int32),
                    "ignore": np.zeros(1, bool),
                }
            ]

        def _load_frame_data(self, entry):
            return np.random.RandomState(0).uniform(
                -10, 30, (200, 4)
            ).astype(np.float32)

    from dataclasses import replace

    cfg = replace(Config(), net_type="lidar")
    ds = LidarDS(cfg)
    f = ds.frame(0, augment=True)
    assert "gt_boxes_dc" in f
    assert f["gt_boxes_dc"].shape[1] == 4  # BEV AABB
    f2 = ds.frame(0, augment=False)
    assert f2["gt_boxes_dc"].shape == (1, 4)
