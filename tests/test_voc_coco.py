"""Legacy VOC/COCO dataset layers: fixture-driven roidb parsing, frame
protocol, and evaluation (ref lib/datasets/pascal_voc.py, coco.py,
voc_eval.py)."""

import json
import os

import numpy as np
import pytest

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config


def _write_png(path, h, w):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8)
    ).save(path)


def _voc_xml(objects):
    objs = "".join(
        f"""
  <object>
    <name>{name}</name>
    <difficult>{diff}</difficult>
    <bndbox><xmin>{b[0]}</xmin><ymin>{b[1]}</ymin><xmax>{b[2]}</xmax><ymax>{b[3]}</ymax></bndbox>
  </object>"""
        for name, diff, b in objects
    )
    return f"<annotation><size><width>96</width><height>64</height></size>{objs}</annotation>"


@pytest.fixture
def voc_root(tmp_path):
    root = tmp_path / "VOCdevkit2007" / "VOC2007"
    (root / "Annotations").mkdir(parents=True)
    (root / "ImageSets" / "Main").mkdir(parents=True)
    (root / "JPEGImages").mkdir(parents=True)
    frames = {
        "000001": [("car", 0, (10, 10, 40, 40)), ("person", 0, (50, 20, 70, 60))],
        "000002": [("dog", 0, (5, 5, 30, 30)), ("cat", 1, (1, 1, 20, 20))],
        "000003": [("sofa", 1, (2, 2, 12, 12))],  # only difficult -> dropped
    }
    for idx, objs in frames.items():
        (root / "Annotations" / f"{idx}.xml").write_text(_voc_xml(objs))
        _write_png(str(root / "JPEGImages" / f"{idx}.jpg"), 64, 96)
    (root / "ImageSets" / "Main" / "trainval.txt").write_text(
        "\n".join(frames) + "\n"
    )
    return tmp_path


def _cfg(tmp_path):
    return cfg_from_list(
        default_config(),
        ("NET_TYPE", "image", "DATA_DIR", str(tmp_path),
         "CACHE_DIR", str(tmp_path / "cache")),
    )


def test_voc_roidb(voc_root):
    from faster_rcnn_pytorch_multimodal_tpu.data.pascal_voc import PascalVocDB

    db = PascalVocDB(_cfg(voc_root), "train")
    assert len(db.classes) == 21
    # frame 3 has only a difficult object -> entire frame dropped
    assert len(db.roidb) == 2
    e = db.roidb[0]
    # 1-based xml -> 0-based boxes
    np.testing.assert_allclose(e["boxes"][0], [9, 9, 39, 39])
    assert db.classes[e["gt_classes"][0]] == "car"
    # difficult object excluded from frame 2
    e2 = db.roidb[1]
    assert len(e2["boxes"]) == 1
    assert db.classes[e2["gt_classes"][0]] == "dog"
    # frame protocol works
    f = db.frame(0, augment=False)
    assert f["data"].shape[2] == 3
    assert f["gt_boxes"].shape[1] == 5


def test_voc_eval_11_point(voc_root):
    from faster_rcnn_pytorch_multimodal_tpu.data.pascal_voc import PascalVocDB

    db = PascalVocDB(_cfg(voc_root), "train")
    j_car = db.classes.index("car")
    dets = {j_car: [{"frame_id": "000001", "bbox": np.array([9, 9, 39, 39]),
                     "confidence": 0.9}]}
    gts = {j_car: {"000001": {"boxes": np.array([[9, 9, 39, 39]], np.float32)}}}
    res = db.evaluate_detections(dets, gts, str(voc_root / "out"))
    # perfect single detection: 11-point AP = 1.0
    assert abs(res["car"] - 1.0) < 1e-6
    assert os.path.exists(voc_root / "out" / "voc_eval.txt")


def test_ap_07_metric_differs():
    from faster_rcnn_pytorch_multimodal_tpu.evaluation.eval_utils import ap

    rec = np.array([0.25, 0.5])
    prec = np.array([1.0, 0.66])
    a10 = ap(rec, prec)
    a07 = ap(rec, prec, use_07_metric=True)
    # 11-point samples at 0.0..1.0: 6 of 11 points have rec >= t coverage
    expected07 = (1.0 + 1.0 + 1.0 + 0.66 + 0.66 + 0.66) / 11.0
    assert abs(a07 - expected07) < 1e-6
    assert a07 != a10


@pytest.fixture
def coco_root(tmp_path):
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    img_dir = root / "images" / "train2014"
    ann = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "width": 96, "height": 64},
            {"id": 2, "file_name": "b.jpg", "width": 96, "height": 64},
        ],
        "annotations": [
            {"image_id": 1, "category_id": 3, "bbox": [10, 10, 30, 30], "iscrowd": 0},
            {"image_id": 1, "category_id": 18, "bbox": [0, 0, 20, 20], "iscrowd": 1},
            {"image_id": 2, "category_id": 3, "bbox": [90, 60, 30, 30], "iscrowd": 0},
            {"image_id": 2, "category_id": 18, "bbox": [5, 5, 0.5, 10], "iscrowd": 0},
        ],
        "categories": [
            {"id": 3, "name": "car"},
            {"id": 18, "name": "dog"},
        ],
    }
    (root / "annotations" / "instances_train2014.json").write_text(
        json.dumps(ann)
    )
    for name in ("a.jpg", "b.jpg"):
        _write_png(str(img_dir / name), 64, 96)
    return tmp_path


def test_coco_roidb(coco_root):
    from faster_rcnn_pytorch_multimodal_tpu.data.coco import CocoDB

    db = CocoDB(_cfg(coco_root), "train")
    assert db.classes == ("__background__", "car", "dog")
    assert len(db.roidb) == 2
    e = db.roidb[0]
    # xywh -> x1y1x2y2 with the w-1 clamp
    np.testing.assert_allclose(e["boxes"][0], [10, 10, 39, 39])
    # crowd annotation became a don't-care box
    assert len(e["boxes_dc"]) == 1
    e2 = db.roidb[1]
    # bbox clipped to the frame; degenerate 0.5-wide box dropped
    np.testing.assert_allclose(e2["boxes"][0], [90, 60, 95, 63])
    assert len(e2["boxes"]) == 1
    f = db.frame(0, augment=False)
    assert f["gt_boxes"].shape == (1, 5)


def test_coco_eval(coco_root):
    from faster_rcnn_pytorch_multimodal_tpu.data.coco import CocoDB

    db = CocoDB(_cfg(coco_root), "train")
    dets = {1: [{"frame_id": "1", "bbox": np.array([10, 10, 39, 39]),
                 "confidence": 0.9}]}
    gts = {1: {"1": {"boxes": np.array([[10, 10, 39, 39]], np.float32)}}}
    res = db.evaluate_detections(dets, gts, str(coco_root / "out"))
    assert abs(res["mAP50"] - 1.0) < 1e-6
    assert abs(res["mAP"] - 1.0) < 1e-6  # exact match survives all IoUs


def test_registry_resolves_voc_coco(voc_root):
    from faster_rcnn_pytorch_multimodal_tpu.data.datasets import get_db

    db = get_db("voc_2007", _cfg(voc_root), "train")
    assert db.num_classes == 21
