"""Host batch loader: shuffled epoch iteration + padding + thread prefetch.

Replaces the reference's RoIDataLayer (shuffled perm + cur pointer,
ref lib/roi_data_layer/layer.py:21-86) and data_layer_generator (background
multiprocessing.Process + Queue(8), ref lib/model/data_layer_generator.py:
22-135).  Pointer state (cur, perm, epoch) is exposed for checkpoint resume
exactly like the reference snapshots it (ref train_val.py:128-137).

All outputs are PADDED to static shapes:
  image:  data (B,H,W,3) — frames resized/padded to cfg.static.image_size
  lidar:  points (B,P,5) + point_valid (B,P) raw; BEV rasterization happens
          on device (ops.voxelize), optionally fused here via `rasterize`.
  gt_boxes (B,G,5|8), gt_mask (B,G), window (B,4)
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from typing import Dict, Optional

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import Config


def _assemble_batch(dataset, cfg: Config, augment: bool, task,
                    rows: Optional[slice] = None) -> Dict[str, np.ndarray]:
    """Pure-numpy host batch assembly from a sampled task.

    Module-level (not a method) so worker PROCESSES can run it without
    the loader/jax state.  Each frame gets its own RandomState seeded
    from the task: (a) frame assembly parallelizes without racing a
    shared RNG, and (b) the augmentation stream derives entirely from the
    checkpointed loader RNG, so a resumed run replays it exactly (the
    dataset-internal RNG is not part of the snapshot).

    Random multi-scale (image nets only, ref minibatch.py:113-120): the
    per-minibatch scale_idx arrives in the task — the BEV raster/anchor
    grid is built for a single scale (lidar multi-scale is waived, see
    COMPONENTS.md).

    Lidar batches return padded raw `points`/`point_valid`; the BEV
    rasterization is device work and happens in BatchLoader._finalize.
    """
    indices, seeds, scale_idx = task
    if rows is not None:
        # multi-host data parallelism: the sampler draws the GLOBAL batch
        # in every process (deterministic), each process assembles only
        # its contiguous row block (parallel/multihost.local_batch_rows)
        indices, seeds = indices[rows], seeds[rows]
    scale = (
        float(cfg.train.scales[scale_idx])
        if augment and cfg.net_type != "lidar"
        else None
    )
    frames = [
        dataset.frame(
            int(i), augment=augment, rng=np.random.RandomState(s), scale=scale
        )
        for i, s in zip(indices, seeds)
    ]
    g = cfg.static.max_gt
    n_elem = 8 if cfg.net_type == "lidar" else 5
    b = len(frames)

    gt = np.zeros((b, g, n_elem), np.float32)
    gt_mask = np.zeros((b, g), bool)
    window = np.zeros((b, 4), np.float32)
    for i, f in enumerate(frames):
        boxes = f["gt_boxes"][:g]
        gt[i, : len(boxes)] = boxes
        gt_mask[i, : len(boxes)] = True
        window[i] = f["window"]

    batch: Dict[str, np.ndarray] = {
        "gt_boxes": gt,
        "gt_mask": gt_mask,
        "window": window,
        "_indices": np.asarray(indices),
    }
    if augment and cfg.net_type != "lidar" and len(cfg.train.scales) > 1:
        # which TRAIN.SCALES entry this minibatch was resized by; the
        # detector indexes its per-scale anchor grids with it
        batch["scale_idx"] = np.int32(scale_idx)

    # don't-care regions (always 4-col: image x1y1x2y2 / lidar BEV AABB)
    # feed proposal_target's dc suppression when TRAIN.IGNORE_DC
    d = cfg.static.max_gt_dc
    dc = np.zeros((b, d, 4), np.float32)
    dc_mask = np.zeros((b, d), bool)
    for i, f in enumerate(frames):
        fdc = f.get("gt_boxes_dc")
        if fdc is not None and len(fdc):
            fdc = fdc[:d]
            dc[i, : len(fdc)] = fdc
            dc_mask[i, : len(fdc)] = True
    batch["gt_boxes_dc"] = dc
    batch["dc_mask"] = dc_mask

    if cfg.net_type == "lidar":
        p = cfg.static.max_points
        pts = np.zeros((b, p, 5), np.float32)
        pvalid = np.zeros((b, p), bool)
        for i, f in enumerate(frames):
            fp = f["points"][:p]
            pts[i, : len(fp)] = fp
            pvalid[i, : len(fp)] = True
        batch["points"] = pts
        batch["point_valid"] = pvalid
    else:
        # pad to the batch max rounded UP to a 64px bucket: raw
        # batch-max padding hands XLA a fresh shape (= a recompile) for
        # every aspect-ratio mix in variable-size datasets; bucketing
        # bounds the compile count while keeping small inputs small
        def _bucket(v: int) -> int:
            return ((v + 63) // 64) * 64

        h = _bucket(max(f["data"].shape[0] for f in frames))
        w = _bucket(max(f["data"].shape[1] for f in frames))
        dtype = frames[0]["data"].dtype
        nch = frames[0]["data"].shape[2]
        # pad lanes with the mean pixel, not zeros: uint8 frames
        # normalize on device, so a zero pad would decode to black
        # (-mean/std) while the reference's blob padding (zeros AFTER
        # mean subtraction, ref blob.py:12-27) is exactly the mean
        # pixel.  Float frames are pre-normalized -> zero pad is mean.
        if np.issubdtype(dtype, np.integer) and nch == len(cfg.pixel_means):
            fill = np.asarray(cfg.pixel_means, np.float32)
            data = np.broadcast_to(
                np.clip(np.round(fill), 0, 255).astype(dtype), (b, h, w, nch)
            ).copy()
        else:
            data = np.zeros((b, h, w, nch), dtype)
        for i, f in enumerate(frames):
            fh, fw = f["data"].shape[:2]
            data[i, :fh, :fw] = f["data"]
        batch["data"] = data
    return batch


def _worker_loop(dataset, cfg: Config, augment: bool, task_q, result_q):
    """Worker-process body: tasks in, assembled numpy batches out.  Never
    touches jax (the parent rasterizes/transfers).  Exits when the parent
    dies (daemon) or the queue closes."""
    while True:
        try:
            seq, task = task_q.get()
        except (EOFError, OSError):
            return
        result_q.put((seq, _assemble_batch(dataset, cfg, augment, task)))


class BatchLoader:
    def __init__(
        self,
        dataset,
        cfg: Config,
        batch_size: int,
        augment: bool = True,
        shuffle: bool = True,
        seed: int = 3,
        prefetch: int = 4,
        rasterize: bool = True,
        workers: int = 0,
    ):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.augment = augment
        self.shuffle = shuffle
        self.rasterize = rasterize
        self._rng = np.random.RandomState(seed)
        self._perm = self._new_perm()
        self._cur = 0
        self._epoch = 0
        self._peeked: Optional[Dict[str, np.ndarray]] = None
        self._q: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._prefetch = prefetch
        self._transfer = None
        # resume bookkeeping: pre-draw sampler state per in-flight
        # prefetched batch (see state_dict)
        self._state_lock = threading.Lock()
        self._inflight: "deque" = deque()
        # workers > 0: assemble batches in SEPARATE PROCESSES (the
        # reference's data layer is a multiprocessing.Process + Queue(8),
        # ref lib/model/data_layer_generator.py:22-135); a GIL-bound
        # prefetch thread cannot keep a ~100 f/s chip fed on multi-core
        # hosts.  Determinism is preserved: the parent samples all
        # (indices, seeds, scale) from the checkpointed rng and workers
        # are pure functions of them.
        self._workers = workers
        self._procs: list = []
        self._raster_fn = None
        if cfg.net_type == "lidar" and rasterize:
            self._raster_fn = self._make_raster_fn()

    # -- sampler state (resume) --------------------------------------------

    def _capture_state(self) -> Dict[str, np.ndarray]:
        # full MT19937 state so a resumed run draws the SAME shuffle +
        # augmentation stream as an uninterrupted one (the reference
        # snapshots/restores np randomness, ref train_val.py:100-140)
        kind, keys, pos, has_gauss, cached = self._rng.get_state()
        assert kind == "MT19937"
        return {
            "cur": np.asarray(self._cur),
            "perm": np.asarray(self._perm),
            "epoch": np.asarray(self._epoch),
            "rng": np.asarray(keys),
            "rng_pos": np.asarray(pos),
            "rng_has_gauss": np.asarray(has_gauss),
            "rng_cached": np.asarray(cached),
        }

    def state_dict(self) -> Dict[str, np.ndarray]:
        """Sampler state of the next UNCONSUMED batch.

        With prefetch running, the live rng has sampled ahead of what the
        training loop has seen; snapshotting the live state would make a
        resumed run SKIP the queued-but-unconsumed batches.  Each in-
        flight task remembers the state it was drawn from; the front of
        that deque is exactly where a resume must restart."""
        with self._state_lock:
            if self._inflight:
                return dict(self._inflight[0])
        return self._capture_state()

    def load_state_dict(self, state: Dict[str, np.ndarray]):
        with self._state_lock:
            self._inflight.clear()
        self._cur = int(state["cur"])
        self._perm = np.asarray(state["perm"])
        self._epoch = int(state["epoch"])
        if "rng" in state:
            # pos defaults to 624 (exhausted block) for old checkpoints that
            # saved only the key buffer
            self._rng.set_state((
                "MT19937",
                np.asarray(state["rng"], np.uint32),
                int(state.get("rng_pos", 624)),
                int(state.get("rng_has_gauss", 0)),
                float(state.get("rng_cached", 0.0)),
            ))

    # -- iteration -------------------------------------------------------

    def _new_perm(self) -> np.ndarray:
        n = len(self.dataset)
        return self._rng.permutation(n) if self.shuffle else np.arange(n)

    def _next_indices(self) -> np.ndarray:
        if self.cfg.debug.freeze_db:
            # pin the sampler to one frame (ref DEBUG.FREEZE_DB,
            # lib/roi_data_layer/layer.py:57-58) — overfit-one-frame debugging
            idx = self.cfg.debug.freeze_db_inds % len(self.dataset)
            return np.full((self.batch_size,), idx, np.int64)
        out = []
        for _ in range(self.batch_size):
            if self._cur >= len(self._perm):
                self._perm = self._new_perm()
                self._cur = 0
                self._epoch += 1
            out.append(self._perm[self._cur])
            self._cur += 1
        return np.asarray(out)

    def _sample_task(self, track: bool = False):
        """Draw one batch's (indices, seeds, scale_idx) from the
        checkpointed sampler rng.  ALL randomness is decided here in the
        parent, so batch assembly — in the prefetch thread or in worker
        processes — is a pure function of the task and the stream replays
        exactly on resume.  track=True (prefetch paths) records the
        pre-draw sampler state for the resume bookkeeping (state_dict)."""
        with self._state_lock:
            if track:
                self._inflight.append(self._capture_state())
            indices = self._next_indices()
            cfg = self.cfg
            scales = cfg.train.scales
            if self.augment and cfg.net_type != "lidar" and len(scales) > 1:
                scale_idx = int(self._rng.randint(len(scales)))
            else:
                scale_idx = 0
            seeds = [int(self._rng.randint(1 << 31)) for _ in indices]
        return np.asarray(indices), seeds, scale_idx

    def peek(self) -> Dict[str, np.ndarray]:
        if self._peeked is None:
            self._peeked = self._build_batch(self._sample_task())
        return self._peeked

    def next(self) -> Dict[str, np.ndarray]:
        if self._peeked is not None:
            b, self._peeked = self._peeked, None
            return b
        if self._thread is not None:
            b = self._q.get()
            with self._state_lock:
                if self._inflight:
                    self._inflight.popleft()
            return b
        return self._build_batch(self._sample_task())

    # -- background prefetch ------------------------------------------------

    def start(self, transfer=None):
        """Begin background prefetch (ref data_layer_generator.start).

        transfer: optional host-batch -> device-batch callable (e.g. the
        solver's shard_batch or a plain jax.device_put) applied INSIDE the
        prefetch pipeline: H2D upload is dispatched asynchronously while
        the device is still computing the previous step, instead of
        serializing on the consumer thread at step-call time.

        With self._workers > 0, batch assembly fans out to worker
        PROCESSES (spawned; they never touch jax/the TPU): the parent
        samples tasks, workers return numpy batches, and a collector
        thread reorders, rasterizes (lidar), transfers, and enqueues —
        batch order is identical to the serial stream.
        """
        if self._thread is not None:
            if transfer is not None and transfer is not self._transfer:
                # a silent no-op here would drop the caller's sharding
                # callback and feed raw host batches to the step
                raise RuntimeError(
                    "loader already started with a different transfer; "
                    "kill() it first"
                )
            return
        self._q = queue.Queue(maxsize=self._prefetch)
        self._stop.clear()
        self._transfer = transfer

        if self._workers > 0:
            self._start_workers()
            return

        def run():
            while not self._stop.is_set():
                batch = self._build_batch(self._sample_task(track=True))
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.25)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def _start_workers(self):
        import multiprocessing as mp

        # spawn, not fork: the parent holds a live TPU client (grpc
        # threads + mutexes) that a forked child would inherit mid-state;
        # spawned children import nothing jax-backed (assembly is numpy)
        ctx = mp.get_context("spawn")
        self._task_q = ctx.Queue(maxsize=self._prefetch + self._workers)
        self._result_q = ctx.Queue(maxsize=self._prefetch + self._workers)
        self._procs = [
            ctx.Process(
                target=_worker_loop,
                args=(self.dataset, self.cfg, self.augment,
                      self._task_q, self._result_q),
                daemon=True,
            )
            for _ in range(self._workers)
        ]
        for p in self._procs:
            p.start()

        def feed():
            seq = 0
            while not self._stop.is_set():
                task = self._sample_task(track=True)
                while not self._stop.is_set():
                    try:
                        self._task_q.put((seq, task), timeout=0.25)
                        seq += 1
                        break
                    except queue.Full:
                        continue

        def collect():
            pending: Dict[int, Dict[str, np.ndarray]] = {}
            expect = 0
            while not self._stop.is_set():
                try:
                    seq, batch = self._result_q.get(timeout=0.25)
                except queue.Empty:
                    continue
                pending[seq] = batch
                while expect in pending:
                    out = self._finalize(pending.pop(expect))
                    expect += 1
                    while not self._stop.is_set():
                        try:
                            self._q.put(out, timeout=0.25)
                            break
                        except queue.Full:
                            continue

        self._feeder = threading.Thread(target=feed, daemon=True)
        self._thread = threading.Thread(target=collect, daemon=True)
        self._feeder.start()
        self._thread.start()

    def kill(self):
        """ref data_layer_generator.kill/clear/join lifecycle."""
        if self._thread is None:
            return
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        for p in self._procs:
            p.terminate()
        for p in self._procs:
            p.join(timeout=2.0)
        self._procs = []
        if getattr(self, "_feeder", None) is not None:
            self._feeder.join(timeout=2.0)
            self._feeder = None
        self._thread.join(timeout=2.0)
        self._thread = None
        self._transfer = None
        # rewind the sampler to the next unconsumed batch: prefetched-but-
        # dropped batches are re-drawn by whoever iterates next
        with self._state_lock:
            front = dict(self._inflight[0]) if self._inflight else None
            self._inflight.clear()
        if front is not None:
            self.load_state_dict(front)

    # -- batch assembly -----------------------------------------------------

    def _make_raster_fn(self):
        import jax
        from functools import partial

        from faster_rcnn_pytorch_multimodal_tpu.ops.voxelize import (
            bev_grid_size,
            voxelize_bev,
        )

        cfg = self.cfg
        scale = float(cfg.train.scales[0])
        num_y, num_x, _ = bev_grid_size(cfg, scale)
        fn = partial(
            voxelize_bev,
            x_range=cfg.lidar.x_range,
            y_range=cfg.lidar.y_range,
            z_range=cfg.lidar.z_range,
            voxel_len=cfg.lidar.voxel_len / scale,
            voxel_height=cfg.lidar.voxel_height,
            num_x=num_x,
            num_y=num_y,
            num_slices=cfg.lidar.num_slices,
            num_meta=cfg.lidar.num_meta_channel,
            max_pts_per_voxel=cfg.lidar.max_pts_per_voxel,
        )
        return jax.jit(jax.vmap(fn))

    def _build_batch(self, task) -> Dict[str, np.ndarray]:
        return self._finalize(
            _assemble_batch(self.dataset, self.cfg, self.augment, task)
        )

    def _finalize(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Parent-side device work on an assembled host batch: the lidar
        BEV rasterization (on-device, see _assemble_batch's points note),
        debug drawing, and the optional H2D transfer callback."""
        indices = batch.pop("_indices", None)
        if self._raster_fn is not None and "points" in batch:
            # keep the raster ON DEVICE: pulling it to host costs a
            # device->host->device round trip of the full BEV tensor
            # per batch (~7 MB), which dominated the step time over the
            # remote-TPU tunnel; only the raw points (~1 MB) upload
            batch["data"] = self._raster_fn(
                batch.pop("points"), batch.pop("point_valid")
            )
        if self.cfg.debug.draw_minibatch and indices is not None:
            self._draw_minibatch(batch, indices)
        if self._transfer is not None:
            batch = self._transfer(batch)
        return batch

    def _draw_minibatch(self, batch: Dict[str, np.ndarray], indices: np.ndarray):
        """DEBUG.DRAW_MINIBATCH: dump each sampled frame with its GT boxes
        (ref minibatch.py:35-107 draw_and_save_{image,lidar}_minibatch)."""
        import os

        from faster_rcnn_pytorch_multimodal_tpu.utils import visualization as viz

        out_dir = os.path.join("debug", "minibatch_draws")
        data = np.asarray(batch["data"])
        for i, idx in enumerate(indices):
            gt = batch["gt_boxes"][i][batch["gt_mask"][i]]
            if self.cfg.net_type == "lidar":
                canvas = viz.draw_detections_bev(
                    data[i], np.zeros((0, 8)), gt7=gt
                )
            else:
                img = data[i] * np.asarray(self.cfg.pixel_stddevs) + np.asarray(
                    self.cfg.pixel_means
                )
                canvas = img[:, :, ::-1]
                if len(gt):
                    canvas = viz.draw_bounding_boxes(canvas, gt)
            viz.save_image(
                canvas,
                os.path.join(out_dir, f"mb_{self._epoch}_{self._cur}_{int(idx)}.png"),
            )
