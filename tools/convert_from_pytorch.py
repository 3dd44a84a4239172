#!/usr/bin/env python
"""Convert a PyTorch checkpoint (torchvision resnet / reference detector
.pth) to an orbax params checkpoint loadable by trainval_net --weights_file.

The jax-era counterpart of ref tools/convert_from_tensorflow*.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description="torch -> jax weight conversion")
    p.add_argument("torch_ckpt", type=str, help=".pth state dict")
    p.add_argument("out_dir", type=str, help="output orbax checkpoint dir")
    p.add_argument("--net", default="res101", type=str)
    p.add_argument("--net_type", default="image", type=str)
    p.add_argument("--en_fpn", default=0, type=int)
    p.add_argument("--num_classes", default=2, type=int)
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch

    from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN
    from faster_rcnn_pytorch_multimodal_tpu.utils.convert import load_resnet_state_dict

    cfg = cfg_from_list(
        default_config(),
        (
            "NET_TYPE", args.net_type, "NET_VARIANT", args.net,
            "USE_FPN", bool(args.en_fpn),
            "TEST.RPN_POST_NMS_TOP_N", "16", "STATIC.NMS_PRE_TEST", "64",
        ),
    )
    model = FasterRCNN(cfg=cfg, num_classes=args.num_classes)
    rng = jax.random.PRNGKey(0)
    c = 15 if args.net_type == "lidar" else 3
    params = jax.jit(model.init)(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 64, 96, c)),
        jnp.asarray([[0.0, 96, 0, 64]]),
    )

    sd = torch.load(args.torch_ckpt, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if args.net == "vgg16":
        from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (
            load_vgg16_state_dict,
        )

        new_params, n = load_vgg16_state_dict(params, sd, verbose=args.verbose)
    elif args.net.startswith("mobile"):
        from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (
            load_mobilenet_state_dict,
        )

        new_params, n = load_mobilenet_state_dict(params, sd, verbose=args.verbose)
    else:
        if args.net_type == "lidar" and "conv1.weight" in sd:
            # imagenet RGB bootstrap for the BEV stem
            # (ref lib/nets/lidarnet.py:249-267)
            from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (
                replicate_conv1_for_lidar,
            )

            sd = replicate_conv1_for_lidar(
                sd, cfg.lidar.num_slices, cfg.lidar.num_channel
            )
        new_params, n = load_resnet_state_dict(
            params, sd, use_fpn=bool(args.en_fpn), verbose=args.verbose
        )
    print(f"loaded {n} tensors from {args.torch_ckpt}")

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(args.out_dir),
            {"state": {"params": jax.device_get(new_params)}},
            force=True,
        )
    print(f"wrote {args.out_dir}")


if __name__ == "__main__":
    main()
