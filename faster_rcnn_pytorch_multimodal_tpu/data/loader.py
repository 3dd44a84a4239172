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
from typing import Dict, Optional

import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import Config


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
        self._pool = None
        self._raster_fn = None
        if cfg.net_type == "lidar" and rasterize:
            self._raster_fn = self._make_raster_fn()

    # -- sampler state (resume) --------------------------------------------

    def state_dict(self) -> Dict[str, np.ndarray]:
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

    def load_state_dict(self, state: Dict[str, np.ndarray]):
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

    def peek(self) -> Dict[str, np.ndarray]:
        if self._peeked is None:
            self._peeked = self._build_batch(self._next_indices())
        return self._peeked

    def next(self) -> Dict[str, np.ndarray]:
        if self._peeked is not None:
            b, self._peeked = self._peeked, None
            return b
        if self._thread is not None:
            return self._q.get()
        return self._build_batch(self._next_indices())

    # -- background prefetch ------------------------------------------------

    def start(self):
        """Begin thread prefetch (ref data_layer_generator.start)."""
        if self._thread is not None:
            return
        self._q = queue.Queue(maxsize=self._prefetch)
        self._stop.clear()

        def run():
            while not self._stop.is_set():
                batch = self._build_batch(self._next_indices())
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.25)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=run, daemon=True)
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
        self._thread.join(timeout=2.0)
        self._thread = None

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

    def _frames(self, indices: np.ndarray):
        """Assemble the batch's frames in parallel.

        Each frame gets its own RandomState seeded from the LOADER rng:
        (a) frame assembly parallelizes without racing a shared RNG (host
        augmentation is ~100 ms/frame at detection sizes — serial assembly
        cannot feed a ~150 ms/step device), and (b) the augmentation
        stream derives entirely from the checkpointed loader RNG, so a
        resumed run replays it exactly (the dataset-internal RNG is not
        part of the snapshot)."""
        cfg = self.cfg
        # random multi-scale: one scale per minibatch drawn from the
        # checkpointed loader RNG (ref minibatch.py:113-120).  Image nets
        # only — the BEV raster/anchor grid is built for a single scale
        # (lidar multi-scale is waived, see COMPONENTS.md).  Drawn BEFORE
        # the per-frame seeds so the stream stays resume-deterministic.
        scales = cfg.train.scales
        if self.augment and cfg.net_type != "lidar" and len(scales) > 1:
            self._scale_idx = int(self._rng.randint(len(scales)))
        else:
            self._scale_idx = 0
        scale = (
            float(scales[self._scale_idx])
            if self.augment and cfg.net_type != "lidar"
            else None
        )
        seeds = [int(self._rng.randint(1 << 31)) for _ in indices]
        import os

        workers = min(8, os.cpu_count() or 1)
        if workers <= 1:
            # single-core host: the pool only adds contention
            return [
                self.dataset.frame(
                    int(i), augment=self.augment,
                    rng=np.random.RandomState(s), scale=scale,
                )
                for i, s in zip(indices, seeds)
            ]
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=workers)
        return list(
            self._pool.map(
                lambda iv: self.dataset.frame(
                    int(iv[0]),
                    augment=self.augment,
                    rng=np.random.RandomState(iv[1]),
                    scale=scale,
                ),
                zip(indices, seeds),
            )
        )

    def _build_batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        frames = self._frames(indices)
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
        }
        if self.augment and cfg.net_type != "lidar" and len(cfg.train.scales) > 1:
            # which TRAIN.SCALES entry this minibatch was resized by; the
            # detector indexes its per-scale anchor grids with it
            batch["scale_idx"] = np.int32(self._scale_idx)

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
            if self._raster_fn is not None:
                # keep the raster ON DEVICE: pulling it to host costs a
                # device->host->device round trip of the full BEV tensor
                # per batch (~7 MB), which dominated the step time over the
                # remote-TPU tunnel; only the raw points (~1 MB) upload
                batch["data"] = self._raster_fn(pts, pvalid)
            else:
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
        if cfg.debug.draw_minibatch:
            self._draw_minibatch(batch, indices)
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
