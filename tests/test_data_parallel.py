"""Data-parallel CORRECTNESS (not just liveness): the same train step on
the same global batch must produce numerically equivalent losses and
parameter updates whether the batch lives on 1 device or is sharded over
the 8-device virtual CPU mesh (conftest.py).  jit'd SPMD semantics are
global, so any divergence means a sharding bug (a collective summing the
wrong axis, a per-shard RNG leak, a mean over a padded shard...)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN
from faster_rcnn_pytorch_multimodal_tpu.parallel.mesh import make_mesh
from faster_rcnn_pytorch_multimodal_tpu.training.solver import (
    create_train_state,
    make_train_step,
)


def _cfg():
    return cfg_from_list(
        default_config(),
        (
            "NET_TYPE", "image",
            "NET_VARIANT", "res18",
            # f32 compute so the equivalence bar can be tight: bf16 rounding
            # would mask real sharding bugs behind quantization noise
            "COMPUTE_DTYPE", "float32",
            "TRAIN.RPN_POST_NMS_TOP_N", "32",
            "TRAIN.ROI_BATCH_SIZE", "16",
            "STATIC.NMS_PRE_TRAIN", "128",
            "STATIC.MAX_GT", "8",
            "ANCHOR_SCALES", "[4,8]",
            "ANCHOR_RATIOS", "[0.5,1,2]",
            "PIXEL_STDDEVS", "[60.,60.,60.]",
        ),
    )


def test_8dev_equals_1dev():
    cfg = _cfg()
    n_dev = 8
    assert len(jax.devices()) >= n_dev
    mesh = make_mesh(cfg, jax.devices()[:n_dev])

    ds = SyntheticDataset(cfg, num_frames=16, num_classes=2, image_hw=(64, 96))
    loader = BatchLoader(ds, cfg, batch_size=n_dev, seed=0)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, loader.peek())
    step = make_train_step(model, opt)
    batch = {k: jnp.asarray(v) for k, v in loader.next().items()}

    # single device: everything on device 0
    one = jax.devices()[0]
    s1, l1 = step(
        jax.device_put(state, one),
        {k: jax.device_put(v, one) for k, v in batch.items()},
        rng,
    )

    # 8-way data parallel: replicated state, batch sharded on dim 0
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(cfg.mesh.axis_name))
    s8, l8 = step(
        jax.device_put(state, repl),
        {k: jax.device_put(v, shard) for k, v in batch.items()},
        rng,
    )

    for k in l1:
        np.testing.assert_allclose(
            float(l1[k]), float(l8[k]), rtol=1e-6, atol=1e-6,
            err_msg=f"loss {k} diverges between 1 and 8 devices",
        )

    p1 = jax.tree_util.tree_leaves_with_path(jax.device_get(s1.params))
    p8 = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(jax.device_get(s8.params))}
    max_delta = 0.0
    for k, v in p1:
        key = jax.tree_util.keystr(k)
        d = float(np.max(np.abs(np.asarray(v) - np.asarray(p8[key]))))
        max_delta = max(max_delta, d)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(p8[key]), rtol=1e-5, atol=1e-6,
            err_msg=f"updated param {key} diverges",
        )
    # keep the number visible in -v runs
    print(f"max param delta 1-dev vs 8-dev: {max_delta:.3e}")
