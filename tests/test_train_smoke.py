"""End-to-end training smoke: tiny res18 detector on synthetic data must
produce finite, decreasing loss; lidar path must run a full step.

This is the fake-dataset train-smoke the reference lacks (SURVEY.md §4
"Implication for the rebuild")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN
from faster_rcnn_pytorch_multimodal_tpu.training.optim import build_optimizer, frozen_mask
from faster_rcnn_pytorch_multimodal_tpu.training.solver import (
    create_train_state,
    make_train_step,
)

_COMMON = (
    "NET_VARIANT", "res18",
    "TRAIN.RPN_POST_NMS_TOP_N", "64",
    "TEST.RPN_POST_NMS_TOP_N", "32",
    "TRAIN.ROI_BATCH_SIZE", "32",
    "STATIC.NMS_PRE_TRAIN", "256",
    "STATIC.NMS_PRE_TEST", "128",
    "STATIC.MAX_GT", "8",
    "ANCHOR_SCALES", "[2,4,8]",
    "ANCHOR_RATIOS", "[0.5,1,2]",
    "PIXEL_STDDEVS", "[60.,60.,60.]",
    "TRAIN.LEARNING_RATE", "0.002",
    "TRAIN.MOMENTUM", "0.9",
)


def _image_cfg():
    return cfg_from_list(default_config(), ("NET_TYPE", "image") + _COMMON)


def _lidar_cfg():
    # tiny BEV grid so CPU tests stay fast: 32x32 cells, 4 slices
    return cfg_from_list(
        default_config(),
        ("NET_TYPE", "lidar") + _COMMON + (
            "LIDAR.X_RANGE", "[0.,32.]",
            "LIDAR.Y_RANGE", "[-16.,16.]",
            "LIDAR.Z_RANGE", "[-2.,2.]",
            "LIDAR.VOXEL_LEN", "1.0",
            "LIDAR.VOXEL_HEIGHT", "1.0",
            "LIDAR.NUM_SLICES", "4",
            "STATIC.MAX_POINTS", "4096",
        ),
    )


def test_image_train_loss_decreases():
    cfg = _image_cfg()
    ds = SyntheticDataset(cfg, num_frames=8, num_classes=2, image_hw=(128, 192))
    loader = BatchLoader(ds, cfg, batch_size=2, seed=1)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, loader.peek())
    step = make_train_step(model, opt)
    first = None
    for i in range(8):
        state, losses = step(state, {k: jnp.asarray(v) for k, v in loader.next().items()}, rng)
        total = float(losses["total_loss"])
        assert np.isfinite(total), f"non-finite loss at iter {i}"
        if first is None:
            first = total
    assert total < first, f"loss did not decrease: {first} -> {total}"


def test_lidar_train_step_runs():
    cfg = _lidar_cfg()
    ds = SyntheticDataset(cfg, num_frames=4, num_classes=2)
    loader = BatchLoader(ds, cfg, batch_size=2, seed=1)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    batch = loader.peek()
    assert batch["data"].shape[-1] == cfg.lidar.num_channel
    assert batch["gt_boxes"].shape[-1] == 8
    state, opt = create_train_state(model, cfg, rng, batch)
    step = make_train_step(model, opt)
    for _ in range(2):
        state, losses = step(state, {k: jnp.asarray(v) for k, v in loader.next().items()}, rng)
    assert np.isfinite(float(losses["total_loss"]))
    assert float(losses["rpn_cross_entropy"]) > 0


def test_lidar_anchor_substride():
    """LIDAR.ANCHOR_SUBSTRIDE=s tiles anchor centers every feat_stride/s
    voxels (framework extension enabling from-scratch BEV training; the
    reference anchor geometry at stride 16 caps anchor-GT IoU at ~0.28
    and upstream always preloads a trained checkpoint instead,
    ref tools/trainval_net.py:334-337).  Lane order must be
    (H, W, sub_y, sub_x, A) to match the RPN conv's per-cell channels."""
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import build_anchor_grid

    base = _lidar_cfg()
    cfg = cfg_from_list(base, ("LIDAR.ANCHOR_SUBSTRIDE", "4"))
    sub, fh, fw = 4, 6, 8
    a_base = base.num_anchors_3d
    assert cfg.num_anchors_3d == a_base * sub * sub

    bev, a3d = build_anchor_grid(cfg, fh, fw, 1.0)
    assert bev.shape == (fh * fw * sub * sub * a_base, 4)
    assert a3d.shape == (fh * fw * sub * sub * a_base, 7)

    from faster_rcnn_pytorch_multimodal_tpu.models.detector import feat_stride

    stride = feat_stride(cfg)
    fine = stride // sub
    g = bev.reshape(fh, fw, sub, sub, a_base, 4)
    cx = (g[..., 0] + g[..., 2]) / 2
    cy = (g[..., 1] + g[..., 3]) / 2
    # sub_x axis advances x centers by the fine stride, sub_y advances y
    np.testing.assert_allclose(np.diff(cx, axis=3), fine, atol=1e-4)
    np.testing.assert_allclose(np.diff(cy, axis=2), fine, atol=1e-4)
    # coarse W/H axes advance by the full feature stride (interior cells;
    # edge cells are pad-replicated by the grid builder)
    np.testing.assert_allclose(np.diff(cx[:, :-1], axis=1), stride, atol=1e-4)
    np.testing.assert_allclose(np.diff(cy[:-1], axis=0), stride, atol=1e-4)
    # substride=1 grid is an exact subsample: its lanes equal the
    # (sub_y=0, sub_x=0) fine lanes
    bev1, _ = build_anchor_grid(base, fh, fw, 1.0)
    g1 = bev1.reshape(fh, fw, a_base, 4)
    np.testing.assert_allclose(g[:-1, :-1, 0, 0], g1[:-1, :-1], atol=1e-4)

    # a full train step runs with the widened RPN head
    ds = SyntheticDataset(cfg, num_frames=2, num_classes=2)
    loader = BatchLoader(ds, cfg, batch_size=1, seed=1)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, loader.peek())
    step = make_train_step(model, opt)
    state, losses = step(
        state, {k: jnp.asarray(v) for k, v in loader.next().items()}, rng
    )
    assert np.isfinite(float(losses["total_loss"]))


def test_live_bn_from_scratch():
    """FIXED_BLOCKS == -1 must run BN in train mode like the reference
    (imagenet.py:110-111, 157-158 set_bn_var + set_bn_train): batch-stat
    normalization with momentum-updated running averages in the
    `batch_stats` collection.  Live stats are the from-scratch enabler —
    see resnet.py FrozenBatchNorm and tools/diag_bev_overfit.py."""
    cfg = cfg_from_list(_image_cfg(), ("RESNET.FIXED_BLOCKS", "-1"))
    ds = SyntheticDataset(cfg, num_frames=2, num_classes=2, image_hw=(64, 96))
    loader = BatchLoader(ds, cfg, batch_size=2, seed=0)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, loader.peek())

    assert "batch_stats" in state.params, "live BN must own a batch_stats collection"
    # frozen-BN mean/var params must NOT exist alongside
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, _ in jax.tree_util.tree_leaves_with_path(state.params["params"])
    }
    assert not any(p.endswith("/mean") or p.endswith("/var") for p in flat)

    before = [np.asarray(x) for x in jax.tree.leaves(state.params["batch_stats"])]
    step = make_train_step(model, opt)
    batch = {k: jnp.asarray(v) for k, v in loader.next().items()}
    state, losses = step(state, batch, rng)
    assert np.isfinite(float(losses["total_loss"]))
    after = [np.asarray(x) for x in jax.tree.leaves(state.params["batch_stats"])]
    moved = sum(not np.allclose(b, a) for b, a in zip(before, after))
    assert moved > 0, "train step must momentum-update the running stats"
    # a second step must run too (stable pytree structure across steps)
    state, _ = step(state, batch, rng)

    # eval path (forward_test) consumes the running averages without error
    out = model.apply(
        state.params,
        batch["data"],
        batch["window"],
        method=FasterRCNN.forward_test,
        rngs={"dropout": rng},
    )
    assert np.isfinite(np.asarray(out["cls_prob"]).sum())

    # default (fixed_blocks >= 0) configs keep the frozen layout
    cfg0 = _image_cfg()
    model0 = FasterRCNN(cfg=cfg0, num_classes=2)
    state0, _ = create_train_state(model0, cfg0, rng, loader.peek())
    assert "batch_stats" not in state0.params


def test_frozen_mask_policy():
    cfg = _image_cfg()
    ds = SyntheticDataset(cfg, num_frames=2, num_classes=2, image_hw=(64, 96))
    loader = BatchLoader(ds, cfg, batch_size=1, seed=0)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    batch = loader.peek()
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.asarray(batch["data"][:1]),
        jnp.asarray(batch["window"][:1]),
    )
    mask = frozen_mask(params, cfg)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    as_str = {jax.tree_util.keystr(p): v for p, v in flat}
    # stem + layer1 (fixed_blocks=1) frozen; layer2+ convs trainable; BN frozen
    assert any("stem" in k and v for k, v in as_str.items())
    assert all(v for k, v in as_str.items() if "layer1" in k and "backbone" in k)
    assert any(
        not v for k, v in as_str.items() if "layer2" in k and "conv" in k.lower()
    )
    assert all(v for k, v in as_str.items() if k.endswith("mean']") or k.endswith("var']"))
    # heads always trainable
    assert not any(v for k, v in as_str.items() if "rpn" in k and "kernel" in k)


def test_image_inference_shapes():
    cfg = _image_cfg()
    ds = SyntheticDataset(cfg, num_frames=2, num_classes=2, image_hw=(128, 192))
    loader = BatchLoader(ds, cfg, batch_size=2, seed=0, augment=False)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    batch = loader.peek()
    images = jnp.asarray(batch["data"])
    window = jnp.asarray(batch["window"])
    params = model.init({"params": rng, "dropout": rng}, images[:1], window[:1])
    out = model.apply(params, images, window, method=FasterRCNN.forward_test)
    s = cfg.test.rpn_post_nms_top_n
    assert out["cls_prob"].shape == (2, s, 2)
    assert out["bbox_pred"].shape == (2, s, 8)
    assert out["rois"].shape == (2, s, 4)
    p = np.asarray(out["cls_prob"])
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)


def test_multiscale_training():
    """Random multi-scale minibatches (ref minibatch.py:113-120): the
    loader samples one TRAIN.SCALES entry per batch, ships scale_idx, and
    the detector selects the matching precomputed anchor grid — train
    steps run at both bucketed input shapes."""
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import build_anchor_grid

    cfg = cfg_from_list(_image_cfg(), ("TRAIN.SCALES", "(0.5,1.0)"))
    ds = SyntheticDataset(cfg, num_frames=8, num_classes=2, image_hw=(128, 192))
    loader = BatchLoader(ds, cfg, batch_size=2, seed=3)
    seen, shapes, batches = set(), {}, []
    for _ in range(8):
        b = loader.next()
        assert "scale_idx" in b
        seen.add(int(b["scale_idx"]))
        shapes[int(b["scale_idx"])] = b["data"].shape
        batches.append(b)
    assert seen == {0, 1}, f"both scales should be sampled, saw {seen}"
    assert shapes[0][1] < shapes[1][1], "0.5-scale frames must be smaller"

    model = FasterRCNN(cfg=cfg, num_classes=2)
    # the traced per-scale grid selection matches the static builder
    bound = model.bind({"params": {}})
    feat = jnp.zeros((1, 8, 12, 1))
    for idx, s in enumerate(cfg.train.scales):
        bev, _ = bound._anchors(feat, "train", jnp.int32(idx))
        ref_bev, _ = build_anchor_grid(cfg, 8, 12, float(s))
        np.testing.assert_allclose(np.asarray(bev), ref_bev, atol=1e-5)

    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, batches[0])
    step = make_train_step(model, opt)
    done = set()
    for b in batches:
        if int(b["scale_idx"]) in done:
            continue
        done.add(int(b["scale_idx"]))
        state, losses = step(
            state, {k: jnp.asarray(v) for k, v in b.items()}, rng
        )
        assert np.isfinite(float(losses["total_loss"]))
    assert done == {0, 1}


def test_multiscale_shard_and_eval():
    """Regression: a multi-scale batch survives the Solver's real path —
    the rank-0 scale_idx leaf must be REPLICATED by shard_batch (a P('data')
    sharding is invalid for rank 0), and make_eval_step must forward
    scale_idx so val minibatches score against the matching anchor grid."""
    from faster_rcnn_pytorch_multimodal_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
    )
    from faster_rcnn_pytorch_multimodal_tpu.training.solver import make_eval_step

    cfg = cfg_from_list(_image_cfg(), ("TRAIN.SCALES", "(0.5,1.0)"))
    ds = SyntheticDataset(cfg, num_frames=8, num_classes=2, image_hw=(128, 192))
    loader = BatchLoader(ds, cfg, batch_size=2, seed=3)
    batches = [loader.next() for _ in range(8)]
    assert {int(b["scale_idx"]) for b in batches} == {0, 1}

    mesh = make_mesh(cfg, jax.devices()[:2])
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, batches[0])
    step = make_train_step(model, opt)
    eval_step = make_eval_step(model)
    done = set()
    for b in batches:
        i = int(b["scale_idx"])
        if i in done:
            continue
        done.add(i)
        sb = shard_batch(b, mesh, cfg)  # crashes pre-fix on the rank-0 leaf
        state, losses = step(state, sb, rng)
        assert np.isfinite(float(losses["total_loss"]))
        ev = eval_step(state.params, sb, rng)
        assert np.isfinite(float(ev["total_loss"]))
    assert done == {0, 1}


def test_mc_dropout_with_live_bn():
    """Regression: epistemic MC inference on a live-BN model (fixed_blocks
    == -1, the from-scratch mode) — the nn.scan/nn.vmap MC lifts must
    broadcast the batch_stats collection alongside params or FrozenBatchNorm
    raises ScopeCollectionNotFound inside the sampled tail."""
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import as_dropout_rng

    cfg = cfg_from_list(
        _image_cfg(),
        (
            "RESNET.FIXED_BLOCKS", "-1",
            "UC.EN_CLS_EPISTEMIC", "True",
            "UC.EN_BBOX_EPISTEMIC", "True",
            "UC.E_NUM_SAMPLE", "4",
            "UC.E_MC_CHUNK", "2",
        ),
    )
    ds = SyntheticDataset(cfg, num_frames=2, num_classes=2, image_hw=(128, 192))
    loader = BatchLoader(ds, cfg, batch_size=2, seed=0, augment=False)
    b = loader.peek()
    data, window = jnp.asarray(b["data"]), jnp.asarray(b["window"])
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, data[:1], window[:1])
    assert "batch_stats" in params, "live-BN model must carry batch_stats"
    out = model.apply(
        params, data, window,
        method=FasterRCNN.forward_test,
        rngs={"dropout": as_dropout_rng(rng)},
    )
    assert np.isfinite(np.asarray(out["cls_prob"])).all()
    assert "e_cls_var" in out["uncertainties"]


def test_use_gt_noise_gate():
    """TRAIN.USE_GT appends GT boxes to the RoI pool.  Default parity:
    EXACT corners (ref proposal_target_layer.py:35-41); the extension flag
    TRAIN.USE_GT_NOISE jitters them ~3% (see COMPONENTS.md deviations).
    Both settings run; with the same rng the jitter must change the
    second-stage losses while exact mode equals itself."""
    base = cfg_from_list(_image_cfg(), ("TRAIN.USE_GT", "True"))
    assert not base.train.use_gt_noise, "parity default must be exact GT"
    noisy = cfg_from_list(base, ("TRAIN.USE_GT_NOISE", "True"))

    ds = SyntheticDataset(base, num_frames=2, num_classes=2, image_hw=(128, 192))
    loader = BatchLoader(ds, base, batch_size=2, seed=0, augment=False)
    b = {k: jnp.asarray(v) for k, v in loader.peek().items()}
    rng = jax.random.PRNGKey(0)

    def losses_for(cfg):
        model = FasterRCNN(cfg=cfg, num_classes=2)
        params = model.init(
            {"params": jax.random.PRNGKey(1), "dropout": rng},
            b["data"][:1], b["window"][:1],
        )
        return model.apply(
            params, b["data"], b["gt_boxes"], b["gt_mask"], b["window"], rng,
            method=FasterRCNN.forward_train,
            rngs={"dropout": rng, "sample": rng},
        )

    l_exact = losses_for(base)
    l_exact2 = losses_for(base)
    l_noisy = losses_for(noisy)
    for l in (l_exact, l_noisy):
        assert np.isfinite(float(l["total_loss"]))
    np.testing.assert_allclose(
        float(l_exact["total_loss"]), float(l_exact2["total_loss"]), rtol=1e-6
    )
    assert float(l_exact["total_loss"]) != float(l_noisy["total_loss"])
