"""Benchmark: res101 training throughput on one chip (image 2D + LiDAR BEV).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

`value` is the mean of the image-config and BEV-config train throughputs
(the driver metric is "frames/sec/chip (res101 image+BEV)"); the other
BASELINE.json configs (FPN-multiscale, RPN-only stage, uncertainty
train/MC-test, BEV+UC) ride along as extra keys.  ALL configs run by
default so the driver-run JSON captures the full surface; set
BENCH_CONFIG=image/bev/fpn/rpn/uc/both to run a subset.

Baseline note: the reference publishes no throughput numbers (BASELINE.md).
`REFERENCE_FPS` is a documented ESTIMATE of its single-GPU TRAINING
throughput: it steps exactly one frame per iteration
(lib/roi_data_layer/minibatch.py:111 asserts batch==1) and a res101
Faster R-CNN train step at Waymo-scale input on a 2019-class GPU runs
~3-5 it/s; we use 4 frames/sec.  vs_baseline = value / REFERENCE_FPS.
The estimate is bracketed by tools/measure_baseline.py
(BASELINE_MEASURED.json): a MEASURED torch train-step proxy built from
the reference's own resnet module, plus an ANALYTIC V100-fp32 upper
bound from the XLA cost analysis of this bench's image step.  When that
artifact exists, its bound is reported as `ref_fps_bound` /
`vs_baseline_bound` alongside the estimate.

Set BENCH_CONFIG=image or BENCH_CONFIG=bev to run a single config.
"""

from __future__ import annotations

import json
import os
import time

REFERENCE_FPS = 4.0

BATCH = 8
WARMUP = 2
ITERS_A = 3
ITERS_B = 23


def _sync(x):
    """Force completion by fetching a scalar to the host.

    jax.block_until_ready is NOT a reliable fence on the axon-tunneled
    TPU platform (observed returning in 2 ms after enqueueing 22 TFLOP,
    i.e. a >10,000 TFLOP/s claim on a ~200 TFLOP/s chip); a device->host
    copy of the result is the only sync that provably waits for the
    whole dispatched chain."""
    import jax.numpy as jnp
    import numpy as np

    return float(np.asarray(jnp.ravel(x)[0]))


def _timed(run_iters, repeats=3):
    """Two-point timing: run N_a iters + fetch, then N_b iters + fetch,
    both from a drained pipeline.  The ~0.2 s tunnel round-trip latency
    of the fetch is constant, so frames/sec = B*(N_b-N_a)/(t_b-t_a)
    cancels it.  The pair is measured `repeats` times and the best rate
    kept: every noise source (host contention, tunnel stalls) only ever
    inflates wall time, so max-fps is the least-biased estimator of the
    device's steady-state rate (observed 115 vs 73 f/s on the same
    config with a concurrent host-side pytest run)."""
    best = 0.0
    for _ in range(repeats):
        t0 = time.time()
        _sync(run_iters(ITERS_A))
        t_a = time.time() - t0
        t0 = time.time()
        _sync(run_iters(ITERS_B))
        t_b = time.time() - t0
        best = max(best, BATCH * (ITERS_B - ITERS_A) / max(t_b - t_a, 1e-9))
    return best


def _pretrained_like_bn(variables):
    """Make the benchmarked step numerically LIVE from random init.

    The bench configs are the supported fine-tune setup (frozen BN,
    FIXED_BLOCKS=1) but start from random weights, where unit-scale
    residual-terminator BN gammas double activation variance per block
    (2^33 over res101's 33 blocks): step-0 losses are ~1e4, the gradient
    global-norm overflows f32 inside the clip, and every step from the
    second on times NaN propagation instead of real training.  Real
    checkpoints have small terminator gammas (the stats/affines absorb the
    growth); emulate that by setting each residual terminator's BN scale
    to 0.25 — (1 + 0.25^2)^33 ~ 7x total variance growth — so losses stay
    finite for the whole measurement.  Parameter VALUES only; the compute
    graph and therefore the timing are unchanged."""
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(dict(variables))
    out = {}
    for k, v in flat.items():
        terminator = k[-2:] == ("bn3", "scale") or (
            # BasicBlock's terminator is bn2 (no bn3 sibling in the block)
            k[-2:] == ("bn2", "scale")
            and k[:-2] + ("bn3", "scale") not in flat
        )
        out[k] = jnp.full_like(v, 0.25) if terminator else v
    return unflatten_dict(out)


def _throughput(cfg, ds_kwargs):
    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN, TrainState
    from faster_rcnn_pytorch_multimodal_tpu.training.solver import (
        create_train_state,
        make_train_step,
    )

    ds = SyntheticDataset(cfg, num_frames=16, **ds_kwargs)
    loader = BatchLoader(ds, cfg, batch_size=BATCH, seed=0)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, loader.peek())
    state = TrainState(
        params=_pretrained_like_bn(state.params),
        opt_state=state.opt_state,
        step=state.step,
    )
    step = make_train_step(model, opt)

    batch = {k: jnp.asarray(v) for k, v in loader.next().items()}
    for _ in range(WARMUP):
        state, losses = step(state, batch, rng)
    _sync(losses["total_loss"])

    def run_iters(n, state=state):
        losses = None
        for _ in range(n):
            state, losses = step(state, batch, rng)
        return losses["total_loss"]

    return _timed(run_iters)


def _e2e_throughput(cfg, ds_kwargs):
    """Sustained train throughput with the HOST PIPELINE IN THE LOOP:
    every step consumes a fresh augmented batch from BatchLoader's
    prefetcher (the reference's data_layer_generator role).  Device-only
    numbers (_throughput) re-step one cached batch; this is the number a
    real training run sees — loader assembly, H2D upload, and the device
    step all overlapping."""
    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN, TrainState
    from faster_rcnn_pytorch_multimodal_tpu.training.solver import (
        create_train_state,
        make_train_step,
    )

    ds = SyntheticDataset(cfg, num_frames=64, **ds_kwargs)
    workers = int(os.environ.get("BENCH_LOADER_WORKERS", "0"))
    loader = BatchLoader(ds, cfg, batch_size=BATCH, seed=0, prefetch=8,
                         workers=workers)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, loader.peek())
    state = TrainState(
        params=_pretrained_like_bn(state.params),
        opt_state=state.opt_state,
        step=state.step,
    )
    step = make_train_step(model, opt)

    # H2D inside the prefetch pipeline: device_put dispatches the upload
    # asynchronously while the device is still on the previous step
    loader.start(
        transfer=lambda b: {k: jax.device_put(v) for k, v in b.items()}
    )
    try:
        for _ in range(WARMUP):
            state, losses = step(state, loader.next(), rng)
        _sync(losses["total_loss"])

        def run_iters(n, state=state):
            losses = None
            for _ in range(n):
                state, losses = step(state, loader.next(), rng)
            return losses["total_loss"]

        return _timed(run_iters)
    finally:
        loader.kill()


def image_config():
    from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config

    # Waymo front camera at --scale 0.5 (1920x930 -> 960x465, padded)
    return cfg_from_list(
        default_config(),
        (
            "NET_TYPE", "image",
            "NET_VARIANT", "res101",
            "PIXEL_STDDEVS", "[60.,60.,60.]",
            "TRAIN.RPN_POST_NMS_TOP_N", "2000",
            "STATIC.NMS_PRE_TRAIN", "4096",
            "STATIC.MAX_GT", "64",
        ),
    )


def bev_config():
    from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config

    # Waymo BEV at --scale 0.5: 400x350x15 raster, 2 rotated anchors/cell
    return cfg_from_list(
        default_config(),
        (
            "NET_TYPE", "lidar",
            "NET_VARIANT", "res101",
            "TRAIN.SCALES", "(0.5,)",
            "TRAIN.RPN_POST_NMS_TOP_N", "2000",
            "STATIC.NMS_PRE_TRAIN", "1024",
            "STATIC.MAX_GT", "64",
            "STATIC.MAX_POINTS", "32768",
        ),
    )


def _test_throughput(cfg, ds_kwargs):
    """Inference frames/sec (forward_test incl. the vmapped MC-dropout
    sampling when epistemic UC is on)."""
    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import (
        FasterRCNN,
        as_dropout_rng,
        cast_for_compute,
    )

    ds = SyntheticDataset(cfg, num_frames=16, **ds_kwargs)
    loader = BatchLoader(ds, cfg, batch_size=BATCH, seed=0, augment=False)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    sample = loader.peek()
    params = jax.jit(model.init)(
        {"params": rng, "dropout": rng},
        jnp.asarray(sample["data"][:1]),
        jnp.asarray(sample["window"][:1]),
    )
    params = _pretrained_like_bn(params)
    fwd = jax.jit(
        lambda p, d, w, key: model.apply(
            cast_for_compute(p, cfg), d, w, method=FasterRCNN.forward_test,
            rngs={"dropout": as_dropout_rng(key)}
        )["cls_prob"]
    )
    batch = loader.next()
    data, window = jnp.asarray(batch["data"]), jnp.asarray(batch["window"])
    for _ in range(WARMUP):
        out = fwd(params, data, window, rng)
    _sync(out)

    def run_iters(n):
        out = None
        for _ in range(n):
            out = fwd(params, data, window, rng)
        return out

    return _timed(run_iters)


def uncertainty_config():
    """Full aleatoric+epistemic image config (ref README uncertainty modes;
    the vmapped MC-dropout tail replaces set_e_num_sample loops)."""
    from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list

    return cfg_from_list(
        image_config(),
        (
            "UC.EN_BBOX_ALEATORIC", "True",
            "UC.EN_CLS_ALEATORIC", "True",
            "UC.EN_BBOX_EPISTEMIC", "True",
            "UC.EN_CLS_EPISTEMIC", "True",
        ),
    )


def fpn_config():
    from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list

    return cfg_from_list(
        image_config(), ("USE_FPN", "True", "POOLING_MODE", "multiscale")
    )


def rpn_only_config():
    """RPN-only training stage (--en_full_net 0, BASELINE.json config list;
    ref trainval_net.py en_full_net flag / train_val.py:424-435)."""
    from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list

    return cfg_from_list(image_config(), ("ENABLE_FULL_NET", "False"))


def bev_uncertainty_config():
    from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list

    return cfg_from_list(
        bev_config(),
        (
            "UC.EN_BBOX_ALEATORIC", "True",
            "UC.EN_CLS_ALEATORIC", "True",
            "UC.EN_BBOX_EPISTEMIC", "True",
            "UC.EN_CLS_EPISTEMIC", "True",
        ),
    )


def _run(store, key, fn, *args):
    """Run one config, isolating failures: a crashed/OOMed config records
    an error note instead of killing the whole bench, so the driver always
    gets a JSON line with whatever completed."""
    import traceback

    try:
        store[key] = round(fn(*args), 2)
    except Exception as exc:  # noqa: BLE001 — report, don't die
        traceback.print_exc()
        store.setdefault("errors", {})[key] = f"{type(exc).__name__}: {exc}"


def main():
    which = os.environ.get("BENCH_CONFIG", "all")
    results = {}
    extras = {}
    img_ds = dict(num_classes=2, image_hw=(512, 960))
    if which in ("image", "both", "all"):
        _run(results, "image_fps", _throughput, image_config(), img_ds)
    if which in ("bev", "both", "all"):
        _run(results, "bev_fps", _throughput, bev_config(), dict(num_classes=2))
    if which in ("e2e", "all"):
        _run(extras, "e2e_image_fps", _e2e_throughput, image_config(), img_ds)
        _run(
            extras, "e2e_bev_fps", _e2e_throughput, bev_config(),
            dict(num_classes=2),
        )
    if which in ("fpn", "all"):
        _run(extras, "fpn_fps", _throughput, fpn_config(), img_ds)
    if which in ("rpn", "all"):
        _run(extras, "rpn_fps", _throughput, rpn_only_config(), img_ds)
    if which in ("uc", "all"):
        ucfg = uncertainty_config()
        _run(extras, "uc_train_fps", _throughput, ucfg, img_ds)
        _run(extras, "uc_test_fps", _test_throughput, ucfg, img_ds)
        _run(
            extras, "bev_uc_train_fps", _throughput,
            bev_uncertainty_config(), dict(num_classes=2),
        )
    errors = {**results.pop("errors", {}), **extras.pop("errors", {})}
    pool = results or extras
    value = round(sum(pool.values()) / max(len(pool), 1), 2)
    out = {
        "metric": "train frames/sec/chip (res101 image 512x960 + BEV 400x350, b8)",
        "value": value,
        "unit": "frames/sec/chip",
        "vs_baseline": round(value / REFERENCE_FPS, 2),
    }
    out.update(results)
    out.update(extras)
    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    if os.path.exists(measured):
        try:
            with open(measured) as f:
                m = json.load(f)
            bound = m.get("flops", {}).get("ref_gpu_fps_bound")
            if bound:
                out["ref_fps_bound"] = bound
                out["vs_baseline_bound"] = round(value / bound, 2)
            bound_b1 = m.get("flops", {}).get("ref_gpu_fps_bound_b1")
            if bound_b1:
                # batch-1 flops denominator (the reference's actual
                # regime); both bounds assume the reference hits 100% of
                # V100 fp32 peak — torch fp32 CNNs typically reach 30-50%
                out["ref_fps_bound_b1"] = bound_b1
                out["vs_baseline_bound_b1"] = round(value / bound_b1, 2)
            cpu_fps = m.get("torch_cpu", {}).get("torch_cpu_fps")
            if cpu_fps:
                out["ref_torch_cpu_fps"] = cpu_fps
        except Exception:
            pass
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
