#!/usr/bin/env python
"""Evaluate a trained detector (mirrors ref tools/test_net.py:151-290 +
lib/model/test.py:138-258: batched frame loop -> per-class thresh+NMS ->
detections pickle -> dataset evaluation)."""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Test a Faster R-CNN network")
    parser.add_argument("--cfg", dest="cfg_file", default=None, type=str)
    parser.add_argument("--weights_file", default=None, type=str,
                        help="orbax checkpoint dir (output of trainval_net)")
    parser.add_argument("--db", dest="db_name", default="synthetic", type=str)
    parser.add_argument("--net", default="res101", type=str)
    parser.add_argument("--net_type", default=None, type=str)
    parser.add_argument("--en_full_net", default=1, type=int)
    parser.add_argument("--en_fpn", default=0, type=int)
    parser.add_argument("--en_epistemic", default=0, type=int)
    parser.add_argument("--en_aleatoric", default=0, type=int)
    parser.add_argument("--uc_sort_type", default=None, type=str)
    parser.add_argument("--iter", dest="iter", default=None, type=int)
    parser.add_argument("--scale", default=None, type=float)
    parser.add_argument("--fixed_blocks", default=None, type=int)
    parser.add_argument("--data_dir", default=None, type=str)
    parser.add_argument("--cache_dir", default=None, type=str)
    parser.add_argument("--out_dir", default="output", type=str)
    parser.add_argument("--thresh", default=0.5, type=float)
    parser.add_argument("--batch_size", default=4, type=int)
    parser.add_argument("--max_frames", default=-1, type=int)
    parser.add_argument("--eval_det", default=1, type=int)
    parser.add_argument("--draw_det", default=0, type=int,
                        help="draw first N frames' detections (uc-colored)")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from trainval_net import build_config, build_dataset  # same dir

    cfg = build_config(args_to_train_ns(args))

    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import (
    FasterRCNN,
    as_dropout_rng,
    cast_for_compute,
)
    from faster_rcnn_pytorch_multimodal_tpu.ops.filter import (
        filter_detections,
        to_per_class_lists,
    )
    from faster_rcnn_pytorch_multimodal_tpu.evaluation.eval_utils import evaluate_class

    db = build_dataset(cfg, args.db_name, "val")
    num_classes = len(db.classes)
    model = FasterRCNN(cfg=cfg, num_classes=num_classes)
    loader = BatchLoader(db, cfg, batch_size=args.batch_size, augment=False,
                         shuffle=False, seed=cfg.rng_seed)

    rng = jax.random.PRNGKey(0)
    sample = loader.peek()
    params = jax.jit(model.init)(
        {"params": rng, "dropout": rng},
        jnp.asarray(sample["data"][:1]),
        jnp.asarray(sample["window"][:1]),
    )
    if args.weights_file:
        from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (
            restore_reconciled,
        )

        params = restore_reconciled(args.weights_file, jax.device_get(params))
        print(f"loaded weights from {args.weights_file}")

    fwd = jax.jit(
        lambda p, d, w, key: model.apply(
            cast_for_compute(p, cfg), d, w, method=FasterRCNN.forward_test,
            rngs={"dropout": as_dropout_rng(key)}
        )
    )
    is_lidar = cfg.net_type == "lidar"
    bbox_elem = cfg.num_bbox_elem

    n_frames = len(db) if args.max_frames <= 0 else min(len(db), args.max_frames)
    all_boxes = [[[] for _ in range(n_frames)] for _ in range(num_classes)]
    all_uncertainties = [[{} for _ in range(n_frames)] for _ in range(num_classes)]
    detections = {j: [] for j in range(1, num_classes)}
    gt_frames = {}

    # one frame-id source for det files, eval joins, and uncertainty
    # analysis: the roidb's frame_id when the dataset has one (synthetic
    # fallback keeps standalone runs working)
    def _fid(i: int) -> str:
        roidb = getattr(db, "roidb", None)
        if roidb is not None and i < len(roidb):
            return str(roidb[i].get("frame_id", f"frame_{i:06d}"))
        return f"frame_{i:06d}"

    t_det = 0.0
    frame_idx = 0
    while frame_idx < n_frames:
        batch = loader.next()
        t0 = time.time()
        out = fwd(params, jnp.asarray(batch["data"]), jnp.asarray(batch["window"]),
                  jax.random.fold_in(rng, frame_idx))
        jax.block_until_ready(out["cls_prob"])
        t_det += time.time() - t0
        b = batch["data"].shape[0]
        for i in range(b):
            if frame_idx >= n_frames:
                break
            filt = filter_detections(
                out["cls_prob"][i],
                out["bbox_pred"][i],
                out["roi_valid"][i],
                num_classes=num_classes,
                bbox_elem=bbox_elem,
                max_dets=cfg.test.max_dets,
                thresh=args.thresh,
                nms_thresh=cfg.test.nms_thresh,
                is_lidar=is_lidar,
                rotated_nms=cfg.test.rotated_nms,
            )
            uc = {k: np.asarray(v[i]) for k, v in out.get("uncertainties", {}).items()}
            boxes_j, _uc_j = to_per_class_lists(filt, uc, num_classes, bbox_elem)
            fid = _fid(frame_idx)
            if args.draw_det and frame_idx < args.draw_det:
                _draw_frame(
                    cfg, db, frame_idx, boxes_j, _uc_j, num_classes,
                    os.path.join(args.out_dir, "eval", db.name, "draws"),
                )
            for j in range(1, num_classes):
                all_boxes[j][frame_idx] = boxes_j[j]
                all_uncertainties[j][frame_idx] = _uc_j[j]
                for row in boxes_j[j]:
                    detections[j].append(
                        {"frame_id": fid, "bbox": row[:bbox_elem], "confidence": row[-1]}
                    )
            # ground truth for self-contained eval
            f = db.frame(frame_idx, augment=False)
            gt = f["gt_boxes"]
            cls_col = gt[:, -1].astype(int)
            gt_frames.setdefault(fid, {})
            gt_frames[fid] = {
                "boxes": gt[:, :bbox_elem],
                "cls": cls_col,
            }
            frame_idx += 1

    print(f"detect: {t_det / max(n_frames,1):.4f}s/frame "
          f"({n_frames / max(t_det, 1e-9):.2f} frames/s)")

    # convert detections out of network frame space BEFORE anything is
    # written (ref test.py:213-224 does this per frame before all_boxes):
    # lidar voxel-grid -> meters; image TEST.SCALES pixels -> raw pixels
    scale = float(cfg.test.scales[0])
    for j in range(1, num_classes):
        for i in range(n_frames):
            rows = (
                np.atleast_2d(np.asarray(all_boxes[j][i], np.float32))
                if len(all_boxes[j][i])
                else np.zeros((0, bbox_elem + 1), np.float32)
            )
            if len(rows):
                # self-contained datasets (synthetic) have no meters/raw
                # frame space: GT is collected in network space above, so
                # detections stay there too
                if is_lidar and hasattr(db, "boxes_voxel_grid_to_pc"):
                    rows[:, :7] = db.boxes_voxel_grid_to_pc(rows[:, :7], scale)
                elif not is_lidar and hasattr(db, "roidb"):
                    rows[:, :4] /= scale
            all_boxes[j][i] = rows

    out_dir = os.path.join(args.out_dir, "eval", db.name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "detections.pkl"), "wb") as f:
        pickle.dump(all_boxes, f)  # ref test.py:252-254

    # per-class det text files incl. trailing uncertainty columns
    # (ref db.py:305-367)
    frame_ids = [_fid(i) for i in range(n_frames)]
    have_uc = any(
        len(all_uncertainties[j][i])
        for j in range(1, num_classes)
        for i in range(n_frames)
    )
    uc_arg = all_uncertainties if have_uc else None
    if hasattr(db, "write_lidar_results") and is_lidar:
        db.write_lidar_results(all_boxes, frame_ids, out_dir, uncertainties=uc_arg)
    elif hasattr(db, "write_image_results"):
        db.write_image_results(all_boxes, frame_ids, out_dir, uncertainties=uc_arg)

    # per-scene / per-frame uncertainty analysis: read the det files back,
    # aggregate by the roidb's scene index (ref waymo_eval.py:106, 148-155,
    # 207-221 via the reconstructed eval_utils surface)
    if have_uc:
        from faster_rcnn_pytorch_multimodal_tpu.evaluation import eval_utils as eu

        scene_of_frame = {}
        roidb = getattr(db, "roidb", None)
        for i in range(n_frames):
            e = roidb[i] if roidb is not None and i < len(roidb) else {}
            scene_of_frame[frame_ids[i]] = int(e.get("scene_idx", 0))
        for j in range(1, num_classes):
            det_path = os.path.join(out_dir, f"det_{db.mode}_{db.classes[j]}.txt")
            if not os.path.exists(det_path):
                continue
            with open(det_path) as f:
                splitlines = [l.strip().split(" ") for l in f if l.strip()]
            if not splitlines:
                continue
            uc_avg, uc_per_det = eu.extract_uncertainties(
                bbox_elem, splitlines, num_classes=num_classes
            )
            det_cnt = {}
            for i, toks in enumerate(splitlines):
                scene = scene_of_frame.get(toks[0], 0)
                eu.accumulate_scene_uncertainty(uc_avg, uc_per_det, i, scene)
                det_cnt[scene] = det_cnt.get(scene, 0) + 1
            lines = [
                eu.write_scene_uncertainty(uc_avg, det_cnt[s], s)
                for s in sorted(det_cnt)
            ]
            lines = [l for l in lines if l]
            if lines:
                if cfg.debug.print_scene_result:  # ref DEBUG.PRINT_SCENE_RESULT
                    for l in lines:
                        print(l)
                p = eu.save_detection_results(
                    lines, out_dir, f"{db.classes[j]}_scene_uncertainty_results.txt"
                )
                print(f"wrote scene uncertainty aggregates to {p}")

    # difficulty-aware dataset evaluation on real datasets: all_boxes are
    # already in meters / raw pixels (above) and the roidb supplies per-box
    # difficulty
    if args.eval_det and hasattr(db, "roidb") and hasattr(db, "evaluate_detections"):
        det_by_class = {j: [] for j in range(1, num_classes)}
        for j in range(1, num_classes):
            for i in range(n_frames):
                for row in all_boxes[j][i]:
                    det_by_class[j].append(
                        {"frame_id": frame_ids[i],
                         "bbox": row[:bbox_elem].copy(), "confidence": row[-1]}
                    )
        gt_by_class = {}
        for j in range(1, num_classes):
            gt_by_class[j] = {}
            for i in range(n_frames):
                e = db.roidb[i]
                sel = e["gt_classes"] == j
                gt_by_class[j][frame_ids[i]] = {
                    "boxes": e["boxes"][sel],
                    "difficulty": e.get("difficulty", np.zeros(sel.sum()))[sel]
                    if len(e.get("difficulty", [])) == len(sel)
                    else np.zeros(int(sel.sum())),
                }
        db.evaluate_detections(det_by_class, gt_by_class, out_dir)
        return

    if args.eval_det:
        eval_type = cfg.lidar.eval_type if is_lidar else "2d"
        iou_t = 0.7 if is_lidar and eval_type != "3d" else (0.5 if not is_lidar else 0.5)
        maps = []
        for j in range(1, num_classes):
            gtc = {
                fid: {"boxes": g["boxes"][g["cls"] == j]}
                for fid, g in gt_frames.items()
            }
            res = evaluate_class(detections[j], gtc, iou_thresh=iou_t, eval_type=eval_type)
            print(f"class {db.classes[j]}: AP={res['ap']:.4f} "
                  f"(tp={res['tp']} fp={res['fp']} npos={res['npos']})")
            maps.append(res["ap"])
        print(f"mAP ({eval_type} @ {iou_t}): {np.mean(maps):.4f}")
        return float(np.mean(maps))


def _rasterize_points(cfg, points):
    """Raw points -> BEV raster for drawing (mirrors the loader path)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_multimodal_tpu.ops.voxelize import (
        bev_grid_size,
        voxelize_bev,
    )

    scale = float(cfg.test.scales[0])
    ny, nx, _ = bev_grid_size(cfg, scale)
    fn = partial(
        voxelize_bev,
        x_range=cfg.lidar.x_range, y_range=cfg.lidar.y_range,
        z_range=cfg.lidar.z_range, voxel_len=cfg.lidar.voxel_len / scale,
        voxel_height=cfg.lidar.voxel_height, num_x=nx, num_y=ny,
        num_slices=cfg.lidar.num_slices, num_meta=cfg.lidar.num_meta_channel,
    )
    import numpy as np

    return np.asarray(
        jax.jit(fn)(jnp.asarray(points), jnp.ones(len(points), bool))
    )


def _draw_frame(cfg, db, idx, boxes_j, uc_j, num_classes, out_dir):
    """uc_sort_type-colored validation drawing (ref db.draw_and_save_eval,
    waymo_lidb.py:229-328) via the shared canvas helper."""
    import numpy as np

    from faster_rcnn_pytorch_multimodal_tpu.evaluation.drawing import (
        draw_frame_detections,
    )

    frame = db.frame(idx, augment=False)
    data = frame.get("data")
    if cfg.net_type == "lidar" and data is None and "points" in frame:
        data = _rasterize_points(cfg, frame["points"])
    draw_frame_detections(
        cfg,
        np.asarray(data),
        boxes_j,
        db.classes,
        os.path.join(out_dir, f"det_{idx:06d}.png"),
        gt_boxes=frame.get("gt_boxes"),
        uc_j=uc_j,
    )


def args_to_train_ns(args):
    """Adapt test args to build_config's expected namespace."""
    import types

    g = lambda name, default=None: getattr(args, name, default)
    ns = types.SimpleNamespace(
        cfg_file=g("cfg_file"), net_type=g("net_type"), net=g("net", "res101"),
        en_full_net=g("en_full_net", 1), en_fpn=g("en_fpn", 0),
        en_aleatoric=g("en_aleatoric", 0), en_epistemic=g("en_epistemic", 0),
        uc_sort_type=g("uc_sort_type"), preload=None,
        fixed_blocks=g("fixed_blocks"), scale=g("scale"),
        train_batch_size=None, val_batch_size=None, iter=g("iter"),
        data_dir=g("data_dir"), cache_dir=g("cache_dir"),
        db_name=g("db_name", "synthetic"), set_cfgs=g("set_cfgs"),
    )
    return ns


if __name__ == "__main__":
    main()
