"""Solver: jitted train step + training loop with snapshot/resume.

Re-design of ref lib/model/train_val.py (SolverWrapper):
  * the per-frame python hot loop + pseudo-batching (:371-460, :379-382)
    becomes ONE jitted, data-parallel step over a real batch;
  * snapshot/restore of params + opt state + sampler pointers + RNG
    (:100-165) goes through orbax;
  * LR step schedule lives inside the optimizer (optim.lr_schedule), so
    restore needs no LR fixup (:268-286 is obsolete by design);
  * GracefulKiller semantics (:37-51): SIGINT/SIGTERM finish the current
    iteration, snapshot, then exit.
"""

from __future__ import annotations

import os
import signal
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from faster_rcnn_pytorch_multimodal_tpu.config import Config
from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN, TrainState
from faster_rcnn_pytorch_multimodal_tpu.training.optim import build_optimizer
from faster_rcnn_pytorch_multimodal_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    state_shardings,
)


def make_train_step(model: FasterRCNN, optimizer: optax.GradientTransformation):
    """One jitted step: loss, grads, update.  Batch layout (leading dim B):
    data (B,H,W,C), gt_boxes (B,G,5|8), gt_mask (B,G), window (B,4)."""

    from faster_rcnn_pytorch_multimodal_tpu.models.detector import (
        as_dropout_rng,
        cast_for_compute,
    )
    from faster_rcnn_pytorch_multimodal_tpu.training.optim import frozen_mask

    def loss_fn(params, batch, rng):
        # stop-gradient the frozen subtree (stem, fixed blocks, every
        # FrozenBatchNorm leaf): torch's requires_grad=False params have
        # no grads at all — so they must not enter the global-norm clip —
        # and XLA DCEs their backward reductions (the per-channel
        # dscale/dbias sums were ~10 ms/step at the benchmark batch)
        froz = frozen_mask(params, model.cfg)
        params = jax.tree.map(
            lambda p, m: jax.lax.stop_gradient(p) if m else p, params, froz
        )
        # mutable batch_stats: live-BN running averages (fixed_blocks == -1,
        # resnet.py FrozenBatchNorm live mode) update as a side output; for
        # frozen-BN configs the collection is absent and `mutated` is empty
        losses, mutated = model.apply(
            cast_for_compute(params, model.cfg),
            batch["data"],
            batch["gt_boxes"],
            batch["gt_mask"],
            batch["window"],
            rng,
            batch.get("gt_boxes_dc"),
            batch.get("dc_mask"),
            batch.get("scale_idx"),
            method=FasterRCNN.forward_train,
            rngs={"dropout": as_dropout_rng(jax.random.fold_in(rng, 1))},
            mutable=["batch_stats"],
        )
        return losses["total_loss"], (losses, mutated)

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        (_, (losses, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if "batch_stats" in mutated:
            params = dict(params)
            params["batch_stats"] = mutated["batch_stats"]
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, losses

    return train_step


def make_val_detect_step(model: FasterRCNN):
    """Jitted full inference pass for the val cycle (drawing + RPN recall),
    ref train_val.py:402-445: run_eval -> filter_and_draw_prep -> draw."""

    from faster_rcnn_pytorch_multimodal_tpu.models.detector import (
        as_dropout_rng,
        cast_for_compute,
    )

    @jax.jit
    def detect(params, data, window, rng):
        return model.apply(
            cast_for_compute(params, model.cfg),
            data,
            window,
            method=FasterRCNN.forward_test,
            rngs={"dropout": as_dropout_rng(rng)},
        )

    return detect


def make_eval_step(model: FasterRCNN):
    """Validation losses on a held-out batch (no update) — the solver's
    periodic val cycle (ref train_val.py:402-445 run_eval path)."""

    from faster_rcnn_pytorch_multimodal_tpu.models.detector import (
        as_dropout_rng,
        cast_for_compute,
    )

    @jax.jit
    def eval_step(params, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        return model.apply(
            cast_for_compute(params, model.cfg),
            batch["data"],
            batch["gt_boxes"],
            batch["gt_mask"],
            batch["window"],
            rng,
            batch.get("gt_boxes_dc"),
            batch.get("dc_mask"),
            batch.get("scale_idx"),
            method=FasterRCNN.forward_train,
            rngs={"dropout": as_dropout_rng(rng)},
        )

    return eval_step


def make_act_summary_step(model: FasterRCNN):
    """Backbone activation statistics for TB (the reference's
    _act_summaries histogram hook, ref vgg16.py:51 / network.py callers):
    the detector sows its head conv output into the `intermediates`
    collection; this jitted probe reduces it to mean/std/absmax scalars
    (full histograms would ship the whole feature map host-side every
    summary tick — the moments are the actionable part)."""
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import cast_for_compute

    @jax.jit
    def act_step(params, batch: Dict[str, jnp.ndarray]):
        _, inter = model.apply(
            cast_for_compute(params, model.cfg),
            batch["data"],
            method=FasterRCNN.features,
            mutable=["intermediates"],
        )
        acts = jax.tree.leaves(inter["intermediates"])
        out = {}
        for i, a in enumerate(acts):
            a = a.astype(jnp.float32)
            out.update({
                f"act_conv{i}/mean": jnp.mean(a),
                f"act_conv{i}/std": jnp.std(a),
                f"act_conv{i}/absmax": jnp.max(jnp.abs(a)),
            })
        return out

    return act_step


def create_train_state(
    model: FasterRCNN,
    cfg: Config,
    rng: jax.Array,
    sample_batch: Dict[str, np.ndarray],
) -> Tuple[TrainState, optax.GradientTransformation]:
    images = jnp.asarray(sample_batch["data"][:1])
    window = jnp.asarray(sample_batch["window"][:1])
    # jit the flax init: eager init dispatches op-by-op, which is painfully
    # slow over a remote-TPU tunnel and needlessly compiles the NMS loop
    params = jax.jit(model.init)({"params": rng, "dropout": rng}, images, window)
    # the activation-summary sow (features) is an ephemeral probe, not
    # trainable/checkpointable state
    params = {k: v for k, v in params.items() if k != "intermediates"}
    optimizer = build_optimizer(params, cfg)
    state = TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    return state, optimizer


class _GracefulKiller:
    """ref train_val.py:37-51."""

    def __init__(self):
        self.kill_now = False
        try:
            signal.signal(signal.SIGINT, self._handler)
            signal.signal(signal.SIGTERM, self._handler)
        except ValueError:
            pass  # not the main thread (tests)

    def _handler(self, *_args):
        self.kill_now = True


class Solver:
    """Training driver (ref SolverWrapper.train_model, train_val.py:304-503)."""

    def __init__(
        self,
        cfg: Config,
        model: FasterRCNN,
        train_loader,
        val_loader=None,
        output_dir: str = "output",
        seed: Optional[int] = None,
        pretrained_path: Optional[str] = None,
    ):
        self.pretrained_path = pretrained_path
        self.cfg = cfg
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.output_dir = output_dir
        self.seed = cfg.rng_seed if seed is None else seed
        # data axis must divide the batch: use the largest divisor of the
        # batch size that fits the visible devices (after reserving the
        # model axis when tensor parallelism is on)
        m = max(1, cfg.mesh.model)
        avail = len(jax.devices()) // m
        n_dev = cfg.mesh.data if cfg.mesh.data > 0 else avail
        b = train_loader.batch_size
        n = max(d for d in range(1, max(min(n_dev, b, avail), 1) + 1) if b % d == 0)
        self.mesh = make_mesh(cfg, jax.devices()[: n * m])
        self._ckpt_dir = os.path.join(os.path.abspath(output_dir), "checkpoints")
        from faster_rcnn_pytorch_multimodal_tpu.training.metrics import MetricsWriter

        self.metrics = MetricsWriter(os.path.join(os.path.abspath(output_dir), "tb"))
        self.metrics_val = (
            MetricsWriter(os.path.join(os.path.abspath(output_dir), "tb"), "val")
            if val_loader is not None
            else None
        )

    # -- checkpointing ----------------------------------------------------

    def snapshot(self, state: TrainState, step: int):
        import orbax.checkpoint as ocp

        os.makedirs(self._ckpt_dir, exist_ok=True)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                os.path.join(self._ckpt_dir, f"iter_{step}"),
                {
                    "state": jax.device_get(state),
                    "sampler": self.train_loader.state_dict(),
                },
                force=True,
            )
        self._gc_snapshots()

    def _gc_snapshots(self):
        """keep-last-N (ref train_val.py:288-302, SNAPSHOT_KEPT)."""
        import shutil

        if not os.path.isdir(self._ckpt_dir):
            return
        snaps = sorted(
            (d for d in os.listdir(self._ckpt_dir) if d.startswith("iter_")),
            key=lambda d: int(d.split("_")[1]),
        )
        for d in snaps[: -self.cfg.train.snapshot_kept]:
            shutil.rmtree(os.path.join(self._ckpt_dir, d), ignore_errors=True)

    def load_pretrained(
        self, state: TrainState, path: str, mode: int = 1
    ) -> TrainState:
        """Staged preload (ref trainval_net.py:319-325, imagenet.py:209-237):
        mode 1 = backbone only (load_pretrained_cnn: backbone + C4 tail),
        mode 2 = everything except the 2nd-stage cls/bbox predictors
        (load_pretrained_full)."""
        from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (
            restore_reconciled,
        )

        # raw restore + BN-stat reconciliation: a frozen-BN checkpoint
        # preloads into a live-BN model (stats -> batch_stats) and vice
        # versa, matching torch where running stats are ordinary state-dict
        # entries at every FIXED_BLOCKS setting
        own_vars = jax.device_get(state.params)
        recon = restore_reconciled(path, own_vars)
        own = own_vars["params"]
        keep_scopes = (
            ("backbone", "tail") if mode == 1 else tuple(k for k in own if k != "predictors")
        )
        new_vars = dict(own_vars)
        for coll in ("params", "batch_stats"):
            if coll not in own_vars:
                continue
            merged = dict(own_vars[coll])
            for scope in keep_scopes:
                if scope in recon.get(coll, {}):
                    merged[scope] = recon[coll][scope]
            new_vars[coll] = merged
        print(f"preloaded mode={mode} scopes={keep_scopes} from {path}")
        return TrainState(
            params=new_vars, opt_state=state.opt_state, step=state.step
        )

    def find_previous(self) -> Optional[str]:
        if not os.path.isdir(self._ckpt_dir):
            return None
        snaps = sorted(
            (d for d in os.listdir(self._ckpt_dir) if d.startswith("iter_")),
            key=lambda d: int(d.split("_")[1]),
        )
        return os.path.join(self._ckpt_dir, snaps[-1]) if snaps else None

    def restore(self, state: TrainState, path: str) -> TrainState:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            target = {
                "state": jax.device_get(state),
                "sampler": self.train_loader.state_dict(),
            }
            restored = ckptr.restore(path, target)
        self.train_loader.load_state_dict(restored["sampler"])
        return restored["state"]

    # -- DEBUG draw switches (ref config.py:19-31, SURVEY §4) ----------------

    def _debug_draws(self, state: TrainState, batch):
        from faster_rcnn_pytorch_multimodal_tpu.utils import debug_draw as dd

        cfg = self.cfg
        out_dir = os.path.join(self.output_dir, "debug_draws")
        host = {k: np.asarray(v) for k, v in batch.items()}
        if cfg.debug.draw_anchors:
            print("DEBUG.DRAW_ANCHORS ->", dd.draw_anchors(cfg, host, out_dir))
        if cfg.debug.draw_anchor_t:
            print(
                "DEBUG.DRAW_ANCHOR_T ->",
                dd.draw_anchor_targets(cfg, host, out_dir),
            )
        if cfg.debug.draw_proposal_t:
            print(
                "DEBUG.DRAW_PROPOSAL_T ->",
                dd.draw_proposal_targets(cfg, self.model, state.params, host, out_dir),
            )

    # -- val cycle detection drawing / RPN recall ---------------------------

    def _val_detections(
        self, val_detect, state: TrainState, val_batch, step: int, max_draw: int = 4
    ) -> Dict[str, float]:
        """Run full inference on the val batch: draw detections (full-net
        mode, ref train_val.py:440-441) or log proposal recall (RPN-only
        mode, ref train_val.py:424-435).  Returns scalars for the val
        metrics writer."""
        import jax.numpy as jnp  # noqa: F811 (local for clarity)

        from faster_rcnn_pytorch_multimodal_tpu.evaluation.drawing import (
            draw_frame_detections,
            proposal_recall,
        )
        from faster_rcnn_pytorch_multimodal_tpu.ops.filter import (
            filter_detections,
            to_per_class_lists,
        )

        cfg = self.cfg
        out = val_detect(
            state.params,
            val_batch["data"],
            val_batch["window"],
            jax.random.PRNGKey(self.seed),
        )
        scalars: Dict[str, float] = {}

        if not cfg.enable_full_net:
            gt = np.asarray(val_batch["gt_boxes"])
            if cfg.net_type == "lidar":
                from faster_rcnn_pytorch_multimodal_tpu.ops.iou import (
                    bbox_3d_to_bev_aabb,
                )

                gt = np.asarray(bbox_3d_to_bev_aabb(jnp.asarray(gt[..., :7])))
            covered, total = proposal_recall(
                np.asarray(out["rois"]),
                np.asarray(out["roi_valid"]),
                gt,
                np.asarray(val_batch["gt_mask"]),
            )
            recall = covered / max(total, 1)
            print(f"val rpn recall@0.5: {recall:.4f} ({covered}/{total})")
            scalars["rpn_recall"] = recall
            return scalars

        classes = getattr(
            self.val_loader.dataset, "classes", None
        ) or [f"cls_{j}" for j in range(self.model.num_classes)]
        num_classes = len(classes)
        draw_dir = os.path.join(self.output_dir, "val_draws", f"iter_{step}")
        b = int(np.asarray(val_batch["data"]).shape[0])
        for i in range(min(b, max_draw)):
            filt = filter_detections(
                out["cls_prob"][i],
                out["bbox_pred"][i],
                out["roi_valid"][i],
                num_classes=num_classes,
                bbox_elem=cfg.num_bbox_elem,
                max_dets=cfg.test.max_dets,
                thresh=0.5,
                nms_thresh=cfg.test.nms_thresh,
                is_lidar=cfg.net_type == "lidar",
                rotated_nms=cfg.test.rotated_nms,
            )
            uc = {
                k: np.asarray(v[i])
                for k, v in out.get("uncertainties", {}).items()
            }
            boxes_j, uc_j = to_per_class_lists(
                filt, uc, num_classes, cfg.num_bbox_elem
            )
            gt_i = np.asarray(val_batch["gt_boxes"][i])[
                np.asarray(val_batch["gt_mask"][i], bool)
            ]
            canvas = draw_frame_detections(
                cfg,
                np.asarray(val_batch["data"][i]),
                boxes_j,
                classes,
                os.path.join(draw_dir, f"det_{i:03d}.png"),
                gt_boxes=gt_i,
                uc_j=uc_j,
            )
            # tensorboard image summary (ref logs GT-drawn val frames into
            # TB, lib/utils/visualization.py:71); PNG already saved above
            if i == 0 and self.metrics_val is not None:
                self.metrics_val.image(
                    step, "val/detections", canvas, save_png=False
                )
        return scalars

    # -- main loop ----------------------------------------------------------

    def train(self, max_iters: int, log_every: Optional[int] = None) -> Dict[str, Any]:
        cfg = self.cfg
        log_every = log_every or cfg.train.display
        killer = _GracefulKiller()
        rng = jax.random.PRNGKey(self.seed)

        sample = self.train_loader.peek()
        state, optimizer = create_train_state(self.model, cfg, rng, sample)
        prev = self.find_previous()
        if prev is not None:
            print(f"restoring from {prev}")
            state = self.restore(state, prev)
        elif self.pretrained_path:
            mode = 2 if cfg.preload_full else 1
            state = self.load_pretrained(state, self.pretrained_path, mode)
        elif cfg.resnet.fixed_blocks >= 0 and cfg.net_variant.startswith("res"):
            # fixed_blocks >= 0 freezes every BN parameter on the assumption
            # that pretrained stats/affines were loaded; training a resnet
            # from scratch like this leaves random frozen BN in the graph.
            # Use --fixed_blocks -1 for from-scratch runs (which also enables
            # zero_init_residual, see models/resnet.py).
            print(
                "WARNING: training from scratch with RESNET.FIXED_BLOCKS="
                f"{cfg.resnet.fixed_blocks} >= 0: frozen random BN affines "
                "will not train. Set FIXED_BLOCKS=-1 or preload weights."
            )
        train_step = make_train_step(self.model, optimizer)
        eval_step = make_eval_step(self.model) if self.val_loader else None
        self._act_step = (
            make_act_summary_step(self.model)
            if cfg.train.en_act_summaries and self.val_loader
            else None
        )
        # full val inference every cycle: detection drawing when the full
        # net trains, proposal-recall logging in RPN-only mode
        # (ref train_val.py:402-445, :424-435)
        val_detect = (
            make_val_detect_step(self.model)
            if self.val_loader
            and (cfg.train.draw_val_detections or not cfg.enable_full_net)
            else None
        )

        # params replicate over the data axis (and, with cfg.mesh.model > 1,
        # the RoI-head channels shard over the model axis); batches shard on
        # the leading dim
        state = jax.device_put(state, state_shardings(state, self.mesh, cfg))

        start = int(state.step)
        t_start = time.time()
        # background prefetch with H2D-in-pipeline (the reference's
        # data_layer_generator role): batches are assembled AND device_put/
        # sharded while the chip runs the previous step; the loader's
        # state_dict stays resume-exact (next-unconsumed-batch semantics)
        self.train_loader.start(
            transfer=lambda b: shard_batch(b, self.mesh, cfg)
        )
        try:
            self._train_loop(
                state, train_step, eval_step, val_detect, rng, start,
                max_iters, log_every, killer, t_start,
            )
        finally:
            self.train_loader.kill()
        return self._train_result

    def _train_loop(
        self, state, train_step, eval_step, val_detect, rng, start,
        max_iters, log_every, killer, t_start,
    ):
        cfg = self.cfg
        last_losses: Dict[str, float] = {}
        frames = 0
        for it in range(start, max_iters):
            batch = self.train_loader.next()
            if it == start and (
                cfg.debug.draw_anchors
                or cfg.debug.draw_anchor_t
                or cfg.debug.draw_proposal_t
            ):
                self._debug_draws(state, batch)
            state, losses = train_step(state, batch, rng)
            frames += int(batch["data"].shape[0])
            if (it + 1) % log_every == 0 or it + 1 == max_iters:
                last_losses = {k: float(v) for k, v in losses.items()}
                self.metrics.scalars(it + 1, last_losses)
                dt = time.time() - t_start
                # keep the reference's "speed: s/iter" display contract
                # (ref train_val.py:463-468) + frames/sec
                print(
                    f"iter: {it + 1} / {max_iters}, total loss: "
                    f"{last_losses['total_loss']:.6f}\n"
                    + "".join(
                        f" >>> {k}: {v:.6f}\n"
                        for k, v in last_losses.items()
                        if k != "total_loss"
                    )
                    + f"speed: {dt / max(it + 1 - start, 1):.3f}s / iter, "
                    f"{frames / dt:.2f} frames/s"
                )
            if eval_step is not None and (it + 1) % log_every == 0:
                val_batch = shard_batch(self.val_loader.next(), self.mesh, cfg)
                val_losses = eval_step(state.params, val_batch, rng)
                scalars = {k: float(v) for k, v in val_losses.items()}
                if self._act_step is not None:
                    scalars.update(
                        {k: float(v)
                         for k, v in self._act_step(state.params, val_batch).items()}
                    )
                if val_detect is not None:
                    scalars.update(
                        self._val_detections(val_detect, state, val_batch, it + 1)
                    )
                self.metrics_val.scalars(it + 1, scalars)
            if (it + 1) % cfg.train.snapshot_iters == 0 or it + 1 == max_iters:
                self.snapshot(state, it + 1)
            if killer.kill_now:
                self.snapshot(state, it + 1)
                break
        self._train_result = {
            "state": state,
            "losses": last_losses,
            "frames_per_sec": frames / (time.time() - t_start),
        }
