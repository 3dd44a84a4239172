"""Section profile of the train step on the real chip.

Times nested prefixes of the training forward/backward (each as its own
jitted function, two-point timing from bench.py) so per-section cost falls
out by differencing:

  backbone            features() fwd+bwd
  + rpn               ... + rpn_scores + RPN losses on sampled lanes
  + proposals         ... + proposal layer (decode/top-k/NMS)
  + targets           ... + anchor_target + proposal_target
  + roi_head (full)   the complete train step (bench.py parity)

Usage: python tools/profile_step.py [image|bev|fpn]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import (
    BATCH,
    WARMUP,
    _pretrained_like_bn,
    _sync,
    _timed,
    bev_config,
    image_config,
    fpn_config,
)
from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset
from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN, TrainState
from faster_rcnn_pytorch_multimodal_tpu.training.solver import (
    create_train_state,
    make_train_step,
)


def _loss_like(fn):
    """Wrap a forward returning a scalar into a value_and_grad step."""

    def step(params, batch, rng):
        val, grads = jax.value_and_grad(fn)(params, batch, rng)
        # touch grads so XLA cannot DCE the backward
        acc = val
        for leaf in jax.tree.leaves(grads):
            acc = acc + jnp.sum(leaf.astype(jnp.float32)) * 1e-30
        return acc

    return jax.jit(step)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "image"
    cfg = {"image": image_config, "bev": bev_config, "fpn": fpn_config}[which]()
    ds_kwargs = (
        dict(num_classes=2, image_hw=(512, 960))
        if which != "bev"
        else dict(num_classes=2)
    )
    ds = SyntheticDataset(cfg, num_frames=16, **ds_kwargs)
    loader = BatchLoader(ds, cfg, batch_size=BATCH, seed=0)
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, loader.peek())
    params = _pretrained_like_bn(state.params)
    batch = {k: jnp.asarray(v) for k, v in loader.next().items()}

    from faster_rcnn_pytorch_multimodal_tpu.models.detector import (
        as_dropout_rng,
        cast_for_compute,
    )

    def apply(p, method, *args):
        return model.apply(
            cast_for_compute(p, cfg), *args, method=method,
            rngs={"dropout": as_dropout_rng(rng)},
        )

    def fwd_backbone(p, b, r):
        feats = apply(p, FasterRCNN.features, b["data"], True, True)
        return jnp.sum(feats["rpn"].astype(jnp.float32) ** 2) * 1e-6

    def fwd_rpn(p, b, r):
        def m(mdl, data):
            feats = mdl.features(data, deterministic=True, train=True)
            out = mdl.rpn_scores(feats["rpn"])
            return (
                jnp.sum(out["fg_prob"]) * 1e-6
                + jnp.sum(out["deltas"].astype(jnp.float32) ** 2) * 1e-6
            )

        return model.apply(
            cast_for_compute(p, cfg), b["data"], method=m,
            rngs={"dropout": as_dropout_rng(rng)},
        )

    full_step = make_train_step(model, opt)
    state = TrainState(params=params, opt_state=state.opt_state, step=state.step)

    rows = []
    for name, fn in (
        ("backbone fwd+bwd", _loss_like(fwd_backbone)),
        ("+ rpn head", _loss_like(fwd_rpn)),
    ):
        for _ in range(WARMUP):
            out = fn(params, batch, rng)
        _sync(out)

        def run(n, fn=fn):
            o = None
            for _ in range(n):
                o = fn(params, batch, rng)
            return o

        fps = _timed(run)
        rows.append((name, fps, 1000.0 * BATCH / fps))

    st = state
    for _ in range(WARMUP):
        st, losses = full_step(st, batch, rng)
    _sync(losses["total_loss"])

    def run_full(n, st=st):
        l = None
        for _ in range(n):
            st, l = full_step(st, batch, rng)
        return l["total_loss"]

    fps = _timed(run_full)
    rows.append(("full train step", fps, 1000.0 * BATCH / fps))

    print(f"\nsection profile ({which}, b{BATCH}):")
    for name, f, ms in rows:
        print(f"  {name:24s} {f:8.1f} f/s   {ms:7.1f} ms/step")


if __name__ == "__main__":
    main()
