"""Solver: snapshot/restore round trip, sampler pointer resume, pretrained
staged preload, metrics writer output."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN
from faster_rcnn_pytorch_multimodal_tpu.training.metrics import MetricsWriter
from faster_rcnn_pytorch_multimodal_tpu.training.solver import Solver

_TINY = (
    "NET_TYPE", "image", "NET_VARIANT", "res18",
    "TRAIN.RPN_POST_NMS_TOP_N", "32",
    "TEST.RPN_POST_NMS_TOP_N", "16",
    "TRAIN.ROI_BATCH_SIZE", "16",
    "STATIC.NMS_PRE_TRAIN", "128",
    "STATIC.NMS_PRE_TEST", "64",
    "STATIC.MAX_GT", "8",
    "ANCHOR_SCALES", "[2,4]",
    "ANCHOR_RATIOS", "[1]",
    "PIXEL_STDDEVS", "[60.,60.,60.]",
    "TRAIN.SNAPSHOT_ITERS", "3",
    "TRAIN.LEARNING_RATE", "0.001",
)


def _solver(tmp_path, n_iters=3):
    cfg = cfg_from_list(default_config(), _TINY)
    ds = SyntheticDataset(cfg, num_frames=6, num_classes=2, image_hw=(64, 96))
    loader = BatchLoader(ds, cfg, batch_size=2, seed=0)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    return cfg, Solver(cfg, model, loader, output_dir=str(tmp_path))


def test_snapshot_restore_roundtrip(tmp_path):
    cfg, solver = _solver(tmp_path)
    res = solver.train(max_iters=3, log_every=3)
    assert os.path.isdir(os.path.join(str(tmp_path), "checkpoints", "iter_3"))
    first_losses = res["losses"]

    # a fresh solver must resume from iter_3 and continue to 5
    cfg2, solver2 = _solver(tmp_path)
    res2 = solver2.train(max_iters=5, log_every=2)
    assert int(res2["state"].step) == 5
    assert np.isfinite(res2["losses"]["total_loss"])
    assert first_losses["total_loss"] != res2["losses"]["total_loss"]


def test_sampler_state_roundtrip(tmp_path):
    cfg = cfg_from_list(default_config(), _TINY)
    ds = SyntheticDataset(cfg, num_frames=6, num_classes=2, image_hw=(64, 96))
    loader = BatchLoader(ds, cfg, batch_size=2, seed=0)
    loader.next()
    state = loader.state_dict()
    loader2 = BatchLoader(ds, cfg, batch_size=2, seed=99)
    loader2.load_state_dict(state)
    assert loader2._cur == loader._cur
    np.testing.assert_array_equal(loader2._perm, loader._perm)


def test_resume_batch_determinism(tmp_path):
    """Train 2N batches vs train N + resume N: the post-resume batch stream
    (shuffle AND augmentation randomness) must be identical (ref
    train_val.py:100-140 restores the numpy RNG state on resume)."""
    cfg = cfg_from_list(default_config(), _TINY)
    ds = SyntheticDataset(cfg, num_frames=6, num_classes=2, image_hw=(64, 96))

    straight = BatchLoader(ds, cfg, batch_size=2, seed=5, augment=True)
    batches_a = [straight.next() for _ in range(6)]

    first = BatchLoader(ds, cfg, batch_size=2, seed=5, augment=True)
    for _ in range(3):
        first.next()
    saved = first.state_dict()
    resumed = BatchLoader(ds, cfg, batch_size=2, seed=999, augment=True)
    resumed.load_state_dict(saved)
    batches_b = [resumed.next() for _ in range(3)]

    for a, b in zip(batches_a[3:], batches_b):
        np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])
        np.testing.assert_array_equal(a["data"], b["data"])


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path / "tb"))
    w.scalars(1, {"loss": 1.5})
    w.scalars(2, {"loss": 1.2})
    w.close()
    lines = open(tmp_path / "tb" / "scalars.jsonl").read().strip().split("\n")
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["step"] == 2 and abs(rec["loss"] - 1.2) < 1e-9


def test_staged_preload_cross_bn_mode(tmp_path):
    """load_pretrained mode=1 brings a frozen-BN checkpoint's backbone —
    including BN running stats — into a live-BN (fixed_blocks=-1) model's
    batch_stats collection, and keeps non-backbone scopes at init
    (torch parity: running stats are state-dict entries at every
    FIXED_BLOCKS, ref imagenet.py:224-237 load_pretrained_cnn)."""
    from faster_rcnn_pytorch_multimodal_tpu.training.solver import (
        create_train_state,
    )

    cfg, solver = _solver(tmp_path)
    solver.train(max_iters=3, log_every=3)
    ckpt = os.path.join(str(tmp_path), "checkpoints", "iter_3")

    live_cfg = cfg_from_list(
        cfg_from_list(default_config(), _TINY), ("RESNET.FIXED_BLOCKS", "-1")
    )
    ds = SyntheticDataset(live_cfg, num_frames=6, num_classes=2, image_hw=(64, 96))
    loader = BatchLoader(ds, live_cfg, batch_size=2, seed=0)
    model = FasterRCNN(cfg=live_cfg, num_classes=2)
    live_solver = Solver(
        live_cfg, model, loader, output_dir=str(tmp_path / "live")
    )
    rng = jax.random.PRNGKey(0)
    state, _ = create_train_state(model, live_cfg, rng, loader.peek())
    assert "batch_stats" in state.params  # live-BN model
    init_pred = jax.device_get(state.params["params"]["predictors"])

    loaded = live_solver.load_pretrained(state, ckpt, mode=1)

    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        raw = ckptr.restore(os.path.abspath(ckpt))
    saved = raw["state"]["params"]["params"]

    got = jax.device_get(loaded.params)
    # backbone conv kernels copied
    np.testing.assert_allclose(
        got["params"]["backbone"]["stem"]["conv1"]["kernel"],
        saved["backbone"]["stem"]["conv1"]["kernel"],
    )
    # frozen checkpoint's BN running stats landed in batch_stats
    np.testing.assert_allclose(
        got["batch_stats"]["backbone"]["stem"]["bn1"]["mean"],
        saved["backbone"]["stem"]["bn1"]["mean"],
    )
    np.testing.assert_allclose(
        got["batch_stats"]["backbone"]["stem"]["bn1"]["var"],
        saved["backbone"]["stem"]["bn1"]["var"],
    )
    # 2nd-stage predictors stay at init for mode=1
    flat_init = jax.tree.leaves(init_pred)
    flat_got = jax.tree.leaves(got["params"]["predictors"])
    for a, b in zip(flat_init, flat_got):
        np.testing.assert_allclose(a, b)


def test_act_summaries():
    """TRAIN.EN_ACT_SUMMARIES: the features() sow surfaces backbone
    activation stats (ref _act_summaries, vgg16.py:51) without growing the
    trainable param tree."""
    import jax
    import numpy as np

    from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list
    from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN
    from faster_rcnn_pytorch_multimodal_tpu.training.solver import (
        create_train_state,
        make_act_summary_step,
    )

    cfg = cfg_from_list(
        cfg_from_list(default_config(), _TINY),
        ("TRAIN.EN_ACT_SUMMARIES", "True"),
    )
    ds = SyntheticDataset(cfg, num_frames=2, num_classes=2, image_hw=(64, 96))
    loader = BatchLoader(ds, cfg, batch_size=1, seed=0, augment=False)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), loader.peek())
    assert "intermediates" not in state.params
    act = make_act_summary_step(model)
    out = {k: float(v) for k, v in act(
        state.params, {k: np.asarray(v) for k, v in loader.peek().items()}
    ).items()}
    assert any(k.endswith("/mean") for k in out)
    assert all(np.isfinite(v) for v in out.values())
