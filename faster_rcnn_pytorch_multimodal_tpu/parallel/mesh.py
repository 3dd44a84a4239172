"""Mesh construction + sharding helpers for pjit parallelism.

Two axes (SURVEY.md §2.17 scale-out plan; no reference counterpart — the
reference is single-GPU):

  * ``data`` — batch dim shards over it (pure DP, the production default).
  * ``model`` (cfg.mesh.model > 1) — tensor parallelism over the detection
    head: the RoI tail's channel dims (conv O-channels / FC out-features /
    per-channel BN vectors) shard over it, and the predictor FCs consume
    the channel-sharded fc7 row-parallel (GSPMD inserts the psum).  With
    ``cfg.mesh.spatial`` the input H dim also shards over ``model`` so the
    backbone convs run spatially partitioned (GSPMD halo exchange).

Parameters are annotated with NamedShardings at device_put time
(``param_shardings``/``state_shardings``); inside jit, GSPMD propagates
from the operands — no per-layer logic in the model code.  Pipeline and
expert axes are intentionally absent (see config.MeshConfig).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from faster_rcnn_pytorch_multimodal_tpu.config import Config


def make_mesh(cfg: Config, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """(data,) or (data, model) mesh over the visible devices.

    The model is CNN-sized (<= ResNet-101), so parameters replicate over
    ``data`` and only the batch shards; ``model`` is the optional tensor/
    spatial-parallel axis.
    """
    if devices is None:
        devices = jax.devices()
    m = max(1, cfg.mesh.model)
    if len(devices) < m:
        raise ValueError(
            f"mesh.model={m} needs >= {m} devices, have {len(devices)}"
        )
    # an explicit device list wins over cfg.mesh.data: callers (the solver)
    # pre-truncate to a batch divisor, and reshaping their shorter list to a
    # larger cfg value would crash
    n = cfg.mesh.data if cfg.mesh.data > 0 else len(devices) // m
    n = max(1, min(n, len(devices) // m))
    if m == 1:
        return Mesh(np.asarray(devices[:n]).reshape(n), (cfg.mesh.axis_name,))
    return Mesh(
        np.asarray(devices[: n * m]).reshape(n, m),
        (cfg.mesh.axis_name, cfg.mesh.model_axis_name),
    )


def batch_sharding(mesh: Mesh, cfg: Config) -> NamedSharding:
    return NamedSharding(mesh, P(cfg.mesh.axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _model_axis_size(mesh: Mesh, cfg: Config) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        cfg.mesh.model_axis_name, 1
    )


def shard_batch(batch: Any, mesh: Mesh, cfg: Config) -> Any:
    """Device-put a host batch with the leading dim sharded over the mesh.

    Scalar (rank-0) leaves — e.g. the loader's per-minibatch `scale_idx` —
    have no batch dim to shard and are replicated instead.  With
    cfg.mesh.spatial on a 2-axis mesh, the image tensor ("data" key,
    B x H x W x C) additionally shards H over the model axis."""
    sh = batch_sharding(mesh, cfg)
    rep = replicated(mesh)
    m = _model_axis_size(mesh, cfg)

    def pick(path, v):
        if not getattr(v, "ndim", 0):
            return rep
        names = _path_names(path)
        if (
            "data" in names
            and cfg.mesh.spatial
            and m > 1
            and v.ndim >= 2
            and v.shape[1] % m == 0
        ):
            return NamedSharding(
                mesh, P(cfg.mesh.axis_name, cfg.mesh.model_axis_name)
            )
        return sh

    shardings = jax.tree_util.tree_map_with_path(pick, batch)
    return jax.tree.map(jax.device_put, batch, shardings)


def _path_names(path) -> list:
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def param_shardings(params: Any, mesh: Mesh, cfg: Config) -> Any:
    """Pytree of NamedShardings for the model variables.

    Tensor-parallel rules (model axis size m > 1):
      * `tail` scope (ResNetLayer4 / FCTail / VGG16Tail): channel dims shard
        over `model` — conv kernels HWIO on O, FC kernels (I, O) on O,
        per-channel vectors (bias / BN scale-bias-mean-var) on C.  This is
        Megatron column parallelism for the RoI head, whose (B*S, 7, 7, ·)
        activations dominate head compute at 2000 RoIs/frame.
      * `predictors` FC kernels shard their INPUT dim (row parallelism):
        they contract the channel-sharded fc7, GSPMD reduces with one psum,
        and the (small) K / E*K outputs come out replicated.
      * everything else replicates over the whole mesh.
    Divisibility-guarded: any dim not divisible by m stays replicated.
    """
    m = _model_axis_size(mesh, cfg)
    ax = cfg.mesh.model_axis_name

    def rule(path, leaf) -> P:
        if m <= 1:
            return P()
        names = _path_names(path)
        shape = getattr(leaf, "shape", ())
        if "tail" in names:
            if len(shape) == 4 and shape[-1] % m == 0:
                return P(None, None, None, ax)
            if len(shape) == 2 and shape[-1] % m == 0:
                return P(None, ax)
            if len(shape) == 1 and shape[0] % m == 0:
                return P(ax)
        if "predictors" in names and len(shape) == 2 and shape[0] % m == 0:
            return P(ax, None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, rule(p, l)), params
    )


def state_shardings(state: Any, mesh: Mesh, cfg: Config) -> Any:
    """Shardings for a TrainState: params per `param_shardings`, optimizer
    state + step replicated (the SGD momentum buffers are small next to the
    activations; replicating them keeps the update math sharding-agnostic)."""
    rep = replicated(mesh)
    return type(state)(
        params=param_shardings(state.params, mesh, cfg),
        opt_state=jax.tree.map(lambda _: rep, state.opt_state),
        step=rep,
    )
