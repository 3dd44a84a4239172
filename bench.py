"""Benchmark: res101 image Faster R-CNN training throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Baseline note: the reference publishes no throughput numbers
(BASELINE.md — "speed: s/iter" is printed per run but never recorded).
`REFERENCE_FPS` below is a documented estimate of the reference's
single-GPU TRAINING throughput: the reference steps exactly one frame per
iteration (lib/roi_data_layer/minibatch.py:111 asserts batch==1) and a
res101 Faster R-CNN train step at Waymo-scale input on a 2019-class GPU
runs ~3-5 it/s; we use 4 frames/sec.  vs_baseline = value / REFERENCE_FPS.
"""

from __future__ import annotations

import json
import time

REFERENCE_FPS = 4.0

# realistic Waymo-front-camera-at-scale-0.5 input (ref trainval_net.py
# --scale 0.5 on 1920x930 -> 960x465, padded to multiples of 64)
H, W = 512, 960
BATCH = 8
WARMUP = 2
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
    from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN
    from faster_rcnn_pytorch_multimodal_tpu.training.solver import (
        create_train_state,
        make_train_step,
    )

    cfg = cfg_from_list(
        default_config(),
        (
            "NET_TYPE", "image",
            "NET_VARIANT", "res101",
            "PIXEL_STDDEVS", "[60.,60.,60.]",
            "TRAIN.RPN_POST_NMS_TOP_N", "2000",
            "STATIC.NMS_PRE_TRAIN", "4096",
            "STATIC.MAX_GT", "64",
        ),
    )
    ds = SyntheticDataset(cfg, num_frames=16, num_classes=2, image_hw=(H, W))
    loader = BatchLoader(ds, cfg, batch_size=BATCH, seed=0)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, loader.peek())
    step = make_train_step(model, opt)

    batch = {k: jnp.asarray(v) for k, v in loader.next().items()}
    for _ in range(WARMUP):
        state, losses = step(state, batch, rng)
    jax.block_until_ready(losses["total_loss"])

    t0 = time.time()
    for _ in range(ITERS):
        state, losses = step(state, batch, rng)
    jax.block_until_ready(losses["total_loss"])
    dt = time.time() - t0

    fps = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "train frames/sec/chip (res101 image, 512x960, b8)",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
