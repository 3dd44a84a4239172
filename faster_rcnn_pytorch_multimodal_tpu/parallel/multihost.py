"""Multi-host (multi-process) data-parallel training pieces.

SURVEY §2.17's scale-out plan is ICI within a slice and DCN across hosts;
the jax form of the host side is: one process per host, each with its
local devices, `jax.distributed.initialize` for the coordination service,
a GLOBAL mesh over `jax.devices()`, per-process host batches assembled
only for the LOCAL shard, and `jax.make_array_from_process_local_data`
stitching the global batch.  GSPMD then runs the same jitted step as the
single-process path — collectives ride the mesh, no per-host logic in
model code.

Pieces:
  * local_batch_rows / global_batch — the loader-side sharding helpers,
  * worker_main — a self-contained 2+-process CPU dryrun worker
    (`python -m faster_rcnn_pytorch_multimodal_tpu.parallel.multihost`),
    launched by __graft_entry__.dryrun_multichip to certify that the
    multi-process mesh reproduces the single-process step exactly
    (each process independently computes the full-batch 1-device
    reference from the shared deterministic sampler and compares).
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict


def local_batch_rows(process_index: int, process_count: int, batch_size: int):
    """Contiguous leading-dim rows owned by this process: jax device order
    is process-major, so row blocks line up with the mesh's data axis."""
    assert batch_size % process_count == 0, (
        f"global batch {batch_size} must divide over {process_count} processes"
    )
    per = batch_size // process_count
    return slice(process_index * per, (process_index + 1) * per)


def global_batch(batch_local: Dict[str, Any], mesh, cfg) -> Dict[str, Any]:
    """Per-process local batch shards -> global jax.Arrays on the mesh.

    Rank-0 leaves (e.g. scale_idx) are replicated; batch tensors shard
    their leading dim over the data axis via
    jax.make_array_from_process_local_data (the multi-host equivalent of
    parallel/mesh.shard_batch's device_put)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded = NamedSharding(mesh, P(cfg.mesh.axis_name))
    replicated = NamedSharding(mesh, P())

    out = {}
    for k, v in batch_local.items():
        v = np.asarray(v)
        if v.ndim == 0:
            out[k] = jax.make_array_from_process_local_data(replicated, v)
        else:
            out[k] = jax.make_array_from_process_local_data(sharded, v)
    return out


def worker_main(argv=None) -> None:
    """One process of the multi-process CPU dryrun.  Env contract (set by
    dryrun_multichip): MH_PROC_ID, MH_NUM_PROCS, MH_COORD (host:port),
    MH_DEVS_PER_PROC."""
    proc_id = int(os.environ["MH_PROC_ID"])
    num_procs = int(os.environ["MH_NUM_PROCS"])
    coord = os.environ["MH_COORD"]
    devs_per_proc = int(os.environ.get("MH_DEVS_PER_PROC", "1"))

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={devs_per_proc}"
        ).strip()
    import jax

    # the container sitecustomize pins the TPU platform at interpreter
    # start; the config API wins before the first backend query
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=num_procs,
        process_id=proc_id,
    )
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

    n_devices = num_procs * devs_per_proc
    assert len(jax.devices()) == n_devices, (
        f"global devices {len(jax.devices())} != {n_devices}"
    )
    assert len(jax.local_devices()) == devs_per_proc

    cfg = cfg_from_list(
        default_config(),
        (
            "NET_TYPE", "image",
            "NET_VARIANT", "res18",
            "PIXEL_STDDEVS", "[60.,60.,60.]",
            "TRAIN.RPN_POST_NMS_TOP_N", "32",
            "TRAIN.ROI_BATCH_SIZE", "16",
            "STATIC.NMS_PRE_TRAIN", "128",
            "STATIC.MAX_GT", "8",
            "ANCHOR_SCALES", "[4,8]",
            "ANCHOR_RATIOS", "[0.5,1,2]",
        ),
    )
    mesh = make_mesh(cfg, jax.devices())
    repl = NamedSharding(mesh, P())

    # every process runs the SAME deterministic sampler (same seed), so
    # the global batch is known everywhere; each assembles only its rows
    # for the device feed, and the full batch for the 1-device reference
    batch_size = n_devices
    ds = SyntheticDataset(cfg, num_frames=batch_size * 2, num_classes=2,
                          image_hw=(64, 96))
    loader = BatchLoader(ds, cfg, batch_size=batch_size, seed=0)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    full = loader.peek()
    state, opt = create_train_state(model, cfg, rng, full)
    state = jax.device_put(state, repl)
    step = make_train_step(model, opt)

    rows = local_batch_rows(proc_id, num_procs, batch_size)
    local = {
        k: (np.asarray(v)[rows] if getattr(v, "ndim", 0) else np.asarray(v))
        for k, v in full.items()
    }
    gbatch = global_batch(local, mesh, cfg)
    state_mp, losses = step(state, gbatch, rng)
    total = float(losses["total_loss"])

    # single-device reference, computed independently in each process
    one = jax.local_devices()[0]
    state_1, losses_1 = step(
        jax.device_put(jax.device_get(state), one),
        {k: jax.device_put(np.asarray(v), one) for k, v in full.items()},
        rng,
    )
    total_1 = float(losses_1["total_loss"])
    assert np.isfinite(total)
    assert abs(total - total_1) < 1e-3 * max(1.0, abs(total_1)), (
        f"proc {proc_id}: loss diverges {total} vs 1-dev {total_1}"
    )
    deltas = jax.tree.map(
        lambda a, b: float(
            jnp.max(jnp.abs(
                np.asarray(jax.device_get(a), np.float32)
                - np.asarray(jax.device_get(b), np.float32)
            ))
        ),
        jax.device_get(state_mp.params),
        jax.device_get(state_1.params),
    )
    max_delta = max(jax.tree.leaves(deltas), default=0.0)
    assert max_delta < 1e-3, (
        f"proc {proc_id}: params diverge, max |mp - 1dev| = {max_delta}"
    )
    if proc_id == 0:
        print(
            f"multihost dryrun ok: {num_procs} processes x {devs_per_proc} "
            f"devices, mesh={mesh}, total_loss={total:.4f}, "
            f"max param delta vs 1-dev={max_delta:.3e}",
            flush=True,
        )
    jax.distributed.shutdown()


if __name__ == "__main__":
    worker_main(sys.argv[1:])
