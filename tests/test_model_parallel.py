"""Tensor/spatial-parallel CORRECTNESS: with cfg.mesh.model > 1 the RoI
head's channels shard over the model axis (and, with cfg.mesh.spatial, the
image H dim shards for the backbone convs).  jit'd SPMD semantics are
global, so a (data x model) step on the same global batch must match the
1-device step — any divergence is a sharding bug (wrong-axis psum, halo
exchange off-by-one, per-shard RNG leak).
"""

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN
from faster_rcnn_pytorch_multimodal_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    state_shardings,
)
from faster_rcnn_pytorch_multimodal_tpu.training.solver import (
    create_train_state,
    make_train_step,
)

import pytest


def _cfg(spatial: bool):
    return cfg_from_list(
        default_config(),
        (
            "NET_TYPE", "image",
            "NET_VARIANT", "res18",
            # f32 compute so the equivalence bar can be tight (see
            # test_data_parallel.py)
            "COMPUTE_DTYPE", "float32",
            "MESH.MODEL", "2",
            "MESH.SPATIAL", str(spatial),
            "TRAIN.RPN_POST_NMS_TOP_N", "32",
            "TRAIN.ROI_BATCH_SIZE", "16",
            "STATIC.NMS_PRE_TRAIN", "128",
            "STATIC.MAX_GT", "8",
            "ANCHOR_SCALES", "[4,8]",
            "ANCHOR_RATIOS", "[0.5,1,2]",
            "PIXEL_STDDEVS", "[60.,60.,60.]",
        ),
    )


@pytest.mark.parametrize("spatial", [False, True], ids=["tp", "tp+sp"])
def test_tensor_parallel_equals_1dev(spatial):
    cfg = _cfg(spatial)
    assert len(jax.devices()) >= 8
    mesh = make_mesh(cfg, jax.devices()[:8])  # (data=4, model=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "model": 2,
    }

    ds = SyntheticDataset(cfg, num_frames=8, num_classes=2, image_hw=(64, 96))
    loader = BatchLoader(ds, cfg, batch_size=4, seed=0)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, loader.peek())
    step = make_train_step(model, opt)
    batch = {k: jnp.asarray(v) for k, v in loader.next().items()}

    one = jax.devices()[0]
    s1, l1 = step(
        jax.device_put(state, one),
        {k: jax.device_put(v, one) for k, v in batch.items()},
        rng,
    )

    sharded_state = jax.device_put(state, state_shardings(state, mesh, cfg))
    # tail channel dims really are sharded (not silently replicated)
    tail_leaf = jax.tree_util.tree_leaves(
        sharded_state.params["params"]["tail"]
    )[0]
    assert not tail_leaf.sharding.is_fully_replicated
    smp, lmp = step(sharded_state, shard_batch(batch, mesh, cfg), rng)

    for k in l1:
        np.testing.assert_allclose(
            float(l1[k]), float(lmp[k]), rtol=1e-5, atol=1e-6,
            err_msg=f"loss {k} diverges between 1-dev and (4x2) mesh",
        )

    p1 = jax.tree_util.tree_leaves_with_path(jax.device_get(s1.params))
    pm = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(jax.device_get(smp.params))}
    max_delta = 0.0
    for k, v in p1:
        key = jax.tree_util.keystr(k)
        d = float(np.max(np.abs(np.asarray(v) - np.asarray(pm[key]))))
        max_delta = max(max_delta, d)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(pm[key]), rtol=1e-4, atol=1e-5,
            err_msg=f"updated param {key} diverges",
        )
    print(f"max param delta 1-dev vs (4x2): {max_delta:.3e}")
