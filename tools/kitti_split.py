#!/usr/bin/env python
"""Generate train/val split files for a KITTI-format dataset
(ref tools/kitti_split.py): writes splits/{train,val}.txt with a
deterministic shuffled split of the labeled frames."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("kitti_dir", type=str, help="<data_dir>/kitti root")
    p.add_argument("--val_fraction", default=0.25, type=float)
    p.add_argument("--seed", default=3, type=int)
    args = p.parse_args(argv)

    label_dir = os.path.join(args.kitti_dir, "training", "label_2")
    ids = sorted(os.path.splitext(f)[0] for f in os.listdir(label_dir))
    rng = np.random.RandomState(args.seed)
    perm = rng.permutation(len(ids))
    n_val = int(len(ids) * args.val_fraction)
    val = sorted(ids[i] for i in perm[:n_val])
    train = sorted(ids[i] for i in perm[n_val:])

    out = os.path.join(args.kitti_dir, "splits")
    os.makedirs(out, exist_ok=True)
    for name, idx in (("train", train), ("val", val)):
        with open(os.path.join(out, f"{name}.txt"), "w") as f:
            f.write("\n".join(idx) + "\n")
        print(f"{name}: {len(idx)} frames")


if __name__ == "__main__":
    main()
