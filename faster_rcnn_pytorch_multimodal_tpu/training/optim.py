"""SGD with the reference's per-parameter groups, as optax transforms.

The reference builds torch SGD param groups with per-param lr/weight-decay:
double-lr bias (optional), no weight decay on bias (unless BIAS_DECAY), and
requires_grad=False on frozen backbone blocks + all BN parameters
(ref lib/model/train_val.py:188-208, lib/nets/imagenet.py:96-116).

Here the same policy is expressed as masked optax transforms over the
parameter tree:
  * frozen mask      -> gradients zeroed (stem conv/bn always; layer1..3 per
                        cfg.resnet.fixed_blocks; every FrozenBatchNorm leaf)
  * bias mask        -> optional 2x lr scale, excluded from weight decay
  * global-norm clip -> cfg.grad_max_clip (ref GRAD_MAX_CLIP=20, config.py:338)
  * step-decay lr    -> gamma at each cfg.train.stepsize boundary
                        (ref train_val.py:277-285,383-390)
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from faster_rcnn_pytorch_multimodal_tpu.config import Config

_BN_LEAVES = ("mean", "var")  # FrozenBatchNorm statistics are never trained


def _path_names(path) -> list:
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def frozen_mask(params: Any, cfg: Config) -> Any:
    """True where the parameter must NOT be trained."""
    fixed = cfg.resnet.fixed_blocks
    frozen_stages = {f"layer{i}" for i in range(1, fixed + 1)}

    def is_frozen(path, _leaf) -> bool:
        names = _path_names(path)
        if names[-1] in _BN_LEAVES:
            return True  # running stats never train
        if fixed < 0:
            # fixed_blocks == -1: train everything, incl. stem and BN affine
            # (ref imagenet.py:110-111 set_bn_var; our BN stats stay frozen —
            # the affine pair absorbs what batch stats would learn)
            return False
        in_backbone = "backbone" in names
        if in_backbone and "stem" in names:
            return True  # conv1 + bn1 always fixed (ref imagenet.py:96-99)
        if any(
            n.startswith("bn") or n.endswith("_bn") or n == "downsample_bn"
            for n in names
        ):
            return True
        if in_backbone and any(n in frozen_stages for n in names):
            return True
        return False

    return jax.tree_util.tree_map_with_path(is_frozen, params)


def bias_mask(params: Any) -> Any:
    def is_bias(path, _leaf) -> bool:
        return _path_names(path)[-1] == "bias"

    return jax.tree_util.tree_map_with_path(is_bias, params)


def decay_mask(params: Any, cfg: Config) -> Any:
    froz = frozen_mask(params, cfg)
    bias = bias_mask(params)

    def wants_decay(f, b) -> bool:
        if f:
            return False
        if b and not cfg.train.bias_decay:
            return False
        return True

    return jax.tree_util.tree_map(wants_decay, froz, bias)


def lr_schedule(cfg: Config) -> Callable:
    """Step decay: lr * gamma^k after each stepsize boundary."""
    boundaries = {int(s): cfg.train.gamma for s in cfg.train.stepsize}
    return optax.piecewise_constant_schedule(cfg.train.learning_rate, boundaries)


def safe_clip_by_global_norm(max_norm: float) -> optax.GradientTransformation:
    """Global-norm clip that cannot overflow f32.

    optax.clip_by_global_norm squares raw gradients: with early-training
    losses of ~1e4 (random init, frozen BN) per-element grads reach ~1e17
    and the sum of squares overflows f32 to inf, after which the
    clip/inf = 0 rescale silently zeroes finite grads (a lost step) and
    turns infinite grads into NaN, poisoning the parameters permanently.  Torch's clip_grad_norm_ has the same squared
    accumulation but torch runs it in f32 on values that already came out
    of an f32 backward — the overflow regime is reachable there too; this
    is a robustness improvement, not a parity deviation (clipping behavior
    is identical for all finite norms).

    LAPACK-style scaled norm: take m = max |g| over the tree, compute
    norm = m * sqrt(sum((g/m)^2)).  The scaled squares are <= 1 per
    element so the accumulation stays finite for any finite gradients.
    Non-finite gradients (inf/NaN anywhere) zero the whole update rather
    than feeding NaN into momentum.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        leaves = jax.tree_util.tree_leaves(updates)
        m = jnp.asarray(0.0, jnp.float32)
        for leaf in leaves:
            m = jnp.maximum(m, jnp.max(jnp.abs(leaf.astype(jnp.float32))))
        # Guard m == 0 (all-zero grads): scale by 1, norm comes out 0.
        safe_m = jnp.where(m > 0, m, 1.0)
        sumsq = jnp.asarray(0.0, jnp.float32)
        for leaf in leaves:
            scaled = leaf.astype(jnp.float32) / safe_m
            sumsq = sumsq + jnp.sum(scaled * scaled)
        norm = safe_m * jnp.sqrt(sumsq)
        finite = jnp.isfinite(norm)
        trim = jnp.where(
            finite, max_norm / jnp.maximum(norm, max_norm), 0.0
        )
        updates = jax.tree_util.tree_map(
            # inf * 0 = NaN, so non-finite norms zero the update explicitly
            lambda g: jnp.where(
                finite, g.astype(jnp.float32) * trim, 0.0
            ).astype(g.dtype),
            updates,
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(params: Any, cfg: Config) -> optax.GradientTransformation:
    transforms = [safe_clip_by_global_norm(cfg.grad_max_clip)]
    transforms.append(
        optax.masked(optax.add_decayed_weights(cfg.train.weight_decay),
                     decay_mask(params, cfg))
    )
    if cfg.train.double_bias:
        transforms.append(optax.masked(optax.scale(2.0), bias_mask(params)))
    transforms.append(optax.sgd(lr_schedule(cfg), momentum=cfg.train.momentum))
    transforms.append(
        optax.masked(optax.set_to_zero(), frozen_mask(params, cfg))
    )
    return optax.chain(*transforms)
