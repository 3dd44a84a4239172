#!/usr/bin/env python
"""Train a Faster R-CNN detector (image 2D or LiDAR BEV).

CLI mirrors the reference's tools/trainval_net.py:43-180 flag surface
(--net_type, --en_full_net, --en_fpn, --en_aleatoric, --en_epistemic,
--uc_sort_type, --preload, --iter, --scale, --fixed_blocks, --db, --iters,
--weights_file, --data_dir, --cache_dir, --batch_size, --net, --set, --cfg);
semantics differ only where the TPU design demands it: --batch_size is a
REAL hardware batch (the reference's meaning was gradient-accumulation
count, ref train_val.py:379-382).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train a Faster R-CNN network")
    parser.add_argument("--cfg", dest="cfg_file", default=None, type=str,
                        help="optional config YAML")
    parser.add_argument("--weights_file", default=None, type=str,
                        help="initialize with pretrained model weights (.msgpack/orbax dir)")
    parser.add_argument("--data_dir", default=None, type=str)
    parser.add_argument("--cache_dir", default=None, type=str)
    parser.add_argument("--db", dest="db_name", default="synthetic", type=str,
                        help="dataset to train on (waymo, kitti, cadc, synthetic)")
    parser.add_argument("--dbval", dest="dbval_name", default=None, type=str)
    parser.add_argument("--iters", dest="max_iters", default=70000, type=int)
    parser.add_argument("--batch_size", dest="train_batch_size", default=None,
                        type=int, help="REAL hardware batch size per step")
    parser.add_argument("--batch_size_val", dest="val_batch_size", default=None, type=int)
    parser.add_argument("--tag", default=None, type=str)
    parser.add_argument("--net", default="res101", type=str,
                        help="vgg16, res18/34/50/101/152, mobile")
    parser.add_argument("--net_type", default=None, type=str, help="lidar or image")
    parser.add_argument("--en_full_net", default=1, type=int)
    parser.add_argument("--en_fpn", default=0, type=int)
    parser.add_argument("--en_epistemic", default=0, type=int)
    parser.add_argument("--en_aleatoric", default=0, type=int)
    parser.add_argument("--uc_sort_type", default=None, type=str)
    parser.add_argument("--iter", dest="iter", default=None, type=int)
    parser.add_argument("--preload", default=None, type=int,
                        help="0: none, 1: backbone, 2: full minus 2nd-stage heads")
    parser.add_argument("--fixed_blocks", default=None, type=int)
    parser.add_argument("--scale", default=None, type=float)
    parser.add_argument("--out_dir", default="output", type=str)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    return parser.parse_args(argv)


def build_config(args):
    """cfg mutation mirroring ref trainval_net.py:298-351."""
    from faster_rcnn_pytorch_multimodal_tpu.config import (
        cfg_from_file,
        cfg_from_list,
        default_config,
    )

    cfg = default_config()
    if args.cfg_file:
        cfg = cfg_from_file(cfg, args.cfg_file)
    overrides = []
    if args.net_type:
        overrides += ["NET_TYPE", "lidar" if args.net_type == "lidar" else "image"]
    overrides += ["NET_VARIANT", args.net]
    overrides += ["ENABLE_FULL_NET", bool(args.en_full_net)]
    overrides += ["USE_FPN", bool(args.en_fpn)]
    if args.en_fpn:
        overrides += ["POOLING_MODE", "multiscale"]
    if args.en_aleatoric:
        overrides += [
            "UC.EN_BBOX_ALEATORIC", True, "UC.EN_CLS_ALEATORIC", True,
        ]
    if args.en_epistemic:
        overrides += [
            "UC.EN_BBOX_EPISTEMIC", True, "UC.EN_CLS_EPISTEMIC", True,
        ]
    if args.uc_sort_type:
        overrides += ["UC.SORT_TYPE", args.uc_sort_type]
    if args.preload is not None:
        overrides += ["PRELOAD", args.preload >= 1, "PRELOAD_FULL", args.preload >= 2]
    if args.fixed_blocks is not None:
        overrides += ["RESNET.FIXED_BLOCKS", args.fixed_blocks]
    if args.scale is not None:
        overrides += ["TRAIN.SCALES", (args.scale,), "TEST.SCALES", (args.scale,)]
    if args.train_batch_size is not None:
        overrides += ["TRAIN.BATCH_SIZE", args.train_batch_size]
    if args.val_batch_size is not None:
        overrides += ["TRAIN.VAL_BATCH_SIZE", args.val_batch_size]
    if args.iter is not None:
        overrides += ["TRAIN.ITER", args.iter]
    if args.data_dir:
        overrides += ["DATA_DIR", args.data_dir]
    if args.cache_dir:
        overrides += ["CACHE_DIR", args.cache_dir]
    overrides += ["DB_NAME", args.db_name.split("_")[0]]
    cfg = cfg_from_list(cfg, tuple(overrides))
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, tuple(args.set_cfgs))
    return cfg


def build_dataset(cfg, db_name: str, mode: str):
    from faster_rcnn_pytorch_multimodal_tpu.data import SyntheticDataset

    if db_name.startswith("synthetic"):
        # disjoint frames per split (seed keys the generator): synthetic
        # val/test measure GENERALIZATION, not training-set memorization
        seed = {"train": 0, "val": 101, "test": 202}.get(mode, 0)
        return SyntheticDataset(
            cfg, num_frames=64, num_classes=2, mode=mode, seed=seed
        )
    from faster_rcnn_pytorch_multimodal_tpu.data import datasets as real_datasets

    return real_datasets.get_db(db_name, cfg, mode)


def main(argv=None):
    args = parse_args(argv)
    cfg = build_config(args)

    from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN
    from faster_rcnn_pytorch_multimodal_tpu.training.solver import Solver

    train_db = build_dataset(cfg, args.db_name, "train")
    loader = BatchLoader(
        train_db,
        cfg,
        batch_size=cfg.train.batch_size,
        augment=cfg.train.augment_en,
        seed=cfg.rng_seed,
    )
    val_loader = None
    if args.dbval_name:
        val_db = build_dataset(cfg, args.dbval_name, "val")
        val_loader = BatchLoader(
            val_db,
            cfg,
            batch_size=cfg.train.batch_size,
            augment=cfg.train.val_augment_en,
            seed=cfg.rng_seed + 1,
        )
    num_classes = len(train_db.classes)
    model = FasterRCNN(cfg=cfg, num_classes=num_classes)
    out_dir = os.path.join(args.out_dir, cfg.net_type, train_db.name)
    solver = Solver(
        cfg,
        model,
        loader,
        val_loader=val_loader,
        output_dir=out_dir,
        pretrained_path=args.weights_file if cfg.preload else None,
    )
    print(f"training {cfg.net_variant} {cfg.net_type} on {train_db.name} "
          f"({len(train_db)} frames, {num_classes} classes) -> {out_dir}")
    # Solver.train owns the prefetch lifecycle (it installs the
    # shard-on-transfer callback and kills the loader on exit)
    result = solver.train(max_iters=args.max_iters)
    print(f"done: {result['frames_per_sec']:.2f} frames/s, "
          f"final loss {result['losses'].get('total_loss')}")
    return result


if __name__ == "__main__":
    main()
