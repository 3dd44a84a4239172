"""Coverage for the smaller subsystems: YAML config, CADC projection,
timers, drawing."""

import math
import os

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_file, default_config
from faster_rcnn_pytorch_multimodal_tpu.utils import visualization as viz
from faster_rcnn_pytorch_multimodal_tpu.utils.cadc_utils import (
    get_image_transform,
    project_pts,
)
from faster_rcnn_pytorch_multimodal_tpu.utils.timer import Timer


def test_cfg_from_yaml(tmp_path):
    y = tmp_path / "exp.yml"
    y.write_text(
        "TRAIN:\n  LEARNING_RATE: 0.02\n  STEPSIZE: [100, 200]\n"
        "NET_TYPE: image\nUC:\n  EN_BBOX_ALEATORIC: true\n"
    )
    cfg = cfg_from_file(default_config(), str(y))
    assert cfg.train.learning_rate == 0.02
    assert cfg.train.stepsize == (100, 200)
    assert cfg.net_type == "image"
    assert cfg.uc.en_bbox_aleatoric is True


def test_cadc_projection(tmp_path):
    calib = tmp_path / "calib.txt"
    calib.write_text(
        "P2: 700 0 600 0 0 700 180 0 0 0 1 0\n"
        "Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n"
    )
    # velo point 20m ahead, 1m left, 0.5m down -> cam (1, 0.5, 20)
    out = project_pts(str(calib), np.array([[20.0, -1.0, -0.5]]))
    np.testing.assert_allclose(out[0, 2], 20.0, atol=1e-6)  # depth
    np.testing.assert_allclose(out[0, 0], 700 * 1.0 / 20.0 + 600, atol=1e-3)
    # behind-camera point flagged with negative z / sentinel uv
    back = project_pts(str(calib), np.array([[-5.0, 0.0, 0.0]]))
    assert back[0, 2] <= 0


def test_image_transform_shape():
    t = get_image_transform(np.eye(3) * 2.0, np.eye(4))
    assert t.shape == (4, 4)
    np.testing.assert_allclose(t[0, 0], 2.0)


def test_timer_accumulates():
    t = Timer()
    t.tic("a")
    _ = sum(range(1000))
    dt = t.toc("a")
    assert dt >= 0
    t.tic("a")
    t.toc("a")
    assert "a:" in t.summary()
    assert t.total_time("a") >= dt


def test_drawing_smoke(tmp_path):
    img = np.random.RandomState(0).uniform(0, 255, (120, 160, 3))
    gt = np.array([[10, 10, 60, 60, 1]], np.float32)
    canvas = viz.draw_bounding_boxes(img, gt, classes=["bg", "car"])
    assert canvas.shape == (120, 160, 3)
    dets = np.array([[20, 20, 70, 70, 0.9], [80, 30, 120, 90, 0.4]], np.float32)
    uc = [{"a_entropy": np.array([0.1])}, {"a_entropy": np.array([0.9])}]
    canvas = viz.draw_detections_image(canvas, dets, uncertainties=uc, sort_key="a_entropy")
    out = tmp_path / "d.png"
    viz.save_image(canvas, str(out))
    assert out.exists()

    bev = np.zeros((100, 80, 15), np.float32)
    bev[40:60, 20:40, 0] = 0.4
    bev[40:60, 20:40, 12] = 0.5
    dets7 = np.array([[30, 50, 1, 20, 10, 2, math.pi / 4, 0.8]], np.float32)
    gt7 = np.array([[30, 50, 1, 20, 10, 2, math.pi / 4]], np.float32)
    canvas = viz.draw_detections_bev(bev, dets7, gt7=gt7)
    assert canvas.shape == (100, 80, 3)


def test_as_dropout_rng():
    """rbg-backed dropout stream: deterministic per key, distinct across
    fold_in steps, usable by flax Dropout-style bernoulli draws."""
    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_multimodal_tpu.models.detector import as_dropout_rng

    k = as_dropout_rng(jax.random.PRNGKey(0))
    m1 = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.5, (64,))
    m1b = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.5, (64,))
    m2 = jax.random.bernoulli(jax.random.fold_in(k, 2), 0.5, (64,))
    assert bool(jnp.all(m1 == m1b))
    assert not bool(jnp.all(m1 == m2))
    # distinct source keys -> distinct rbg streams
    k2 = as_dropout_rng(jax.random.PRNGKey(1))
    m3 = jax.random.bernoulli(jax.random.fold_in(k2, 1), 0.5, (64,))
    assert not bool(jnp.all(m1 == m3))
