#!/usr/bin/env python
"""Import a tf-faster-rcnn (tf-slim) checkpoint.

The reference bootstraps its zoo from tf-faster-rcnn checkpoints via three
scripts (ref tools/convert_from_tensorflow{,_vgg,_mobile}.py): rename the
tf-slim variable names into the torch key space and transpose HWIO->OIHW.
This tool is the same surface with two output modes:

  * --to_pth: write the renamed dict as .npz (the torch-key interchange
    format convert_from_pytorch.py consumes) — pure numpy, no TF needed
    when the input is already an .npz of raw tf variables,
  * default: continue into a flax/orbax checkpoint through the existing
    load_*_state_dict pipeline.

Reading a real .ckpt requires tensorflow (import-gated like the ETL
tools); the rename/transpose core is pure numpy
(utils/convert.tf_slim_*_to_torch) and tested TF-free in
tests/test_tf_converter.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def read_tf_checkpoint(path: str) -> dict:
    """{var_name: ndarray} from a TF checkpoint (needs tensorflow) or an
    .npz of raw tf-slim variables (TF-free)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    try:
        import tensorflow as tf
    except ImportError as e:
        sys.exit(
            f"reading a .ckpt needs tensorflow ({e}); export the variables "
            "to .npz on a machine that has it, or pass an .npz directly"
        )
    reader = tf.train.load_checkpoint(path)
    return {
        k: reader.get_tensor(k)
        for k in reader.get_variable_to_shape_map()
    }


def main(argv=None):
    p = argparse.ArgumentParser(description="tf-slim -> torch-key / flax")
    p.add_argument("tf_ckpt", type=str, help=".ckpt prefix or .npz of variables")
    p.add_argument("--net", default="res101",
                   choices=("res50", "res101", "res152", "vgg16", "mobile"))
    p.add_argument("--to_npz", default=None,
                   help="write the torch-key dict here and stop")
    p.add_argument("--out_dir", default=None,
                   help="continue into an orbax checkpoint (convert_from_pytorch)")
    p.add_argument("--net_type", default="image", type=str)
    p.add_argument("--num_classes", default=2, type=int)
    args = p.parse_args(argv)

    from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (
        tf_slim_mobilenet_to_torch,
        tf_slim_resnet_to_torch,
        tf_slim_vgg_to_torch,
    )

    var_dict = read_tf_checkpoint(args.tf_ckpt)
    fn = {
        "vgg16": tf_slim_vgg_to_torch,
        "mobile": tf_slim_mobilenet_to_torch,
    }.get(args.net, tf_slim_resnet_to_torch)
    torch_sd = fn(var_dict)
    print(f"{len(var_dict)} tf variables -> {len(torch_sd)} torch-key tensors")

    if args.to_npz:
        np.savez(args.to_npz, **torch_sd)
        print(f"wrote {args.to_npz}")
        return

    if args.out_dir:
        # hand off to the torch->flax pipeline via a temp .pth
        import torch

        tmp = os.path.join(os.path.dirname(args.out_dir) or ".", "_tf_import.pth")
        torch.save({k: torch.from_numpy(v) for k, v in torch_sd.items()}, tmp)
        from convert_from_pytorch import main as torch_main

        torch_main([
            tmp, args.out_dir, "--net",
            {"mobile": "mobilenet"}.get(args.net, args.net),
            "--net_type", args.net_type,
            "--num_classes", str(args.num_classes),
        ])
        os.remove(tmp)


if __name__ == "__main__":
    main()
