"""Mesh construction + sharding helpers for pjit data parallelism."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from faster_rcnn_pytorch_multimodal_tpu.config import Config


def make_mesh(cfg: Config, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the visible devices.

    The model is CNN-sized (<= ResNet-101), so parameters replicate and only
    the batch shards; the mesh is still the extension point for adding model
    axes later (SURVEY.md §2.17 plan).
    """
    if devices is None:
        devices = jax.devices()
    # an explicit device list wins over cfg.mesh.data: callers (the solver)
    # pre-truncate to a batch divisor, and reshaping their shorter list to a
    # larger cfg value would crash
    n = cfg.mesh.data if cfg.mesh.data > 0 else len(devices)
    n = min(n, len(devices))
    return Mesh(np.asarray(devices[:n]).reshape(n), (cfg.mesh.axis_name,))


def batch_sharding(mesh: Mesh, cfg: Config) -> NamedSharding:
    return NamedSharding(mesh, P(cfg.mesh.axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, cfg: Config) -> Any:
    """Device-put a host batch with the leading dim sharded over the mesh.

    Scalar (rank-0) leaves — e.g. the loader's per-minibatch `scale_idx` —
    have no batch dim to shard and are replicated instead."""
    sh = batch_sharding(mesh, cfg)
    rep = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sh if getattr(x, "ndim", 0) else rep), batch
    )
