"""safe_clip_by_global_norm: matches optax for finite norms, survives
overflow-scale and non-finite gradients (the NaN regime STATUS.md
documents for random-init frozen-BN training)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from faster_rcnn_pytorch_multimodal_tpu.training.optim import (
    safe_clip_by_global_norm,
)


def _tree(*arrays):
    return {f"p{i}": jnp.asarray(a, jnp.float32) for i, a in enumerate(arrays)}


def _apply(tx, grads):
    state = tx.init(grads)
    out, _ = tx.update(grads, state)
    return out


def test_matches_optax_in_normal_range():
    rng = np.random.RandomState(0)
    grads = _tree(rng.randn(7, 3) * 5, rng.randn(11) * 0.1)
    ours = _apply(safe_clip_by_global_norm(1.5), grads)
    ref = _apply(optax.clip_by_global_norm(1.5), grads)
    for k in grads:
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-6)


def test_noop_below_threshold():
    grads = _tree([0.1, -0.2], [0.05])
    out = _apply(safe_clip_by_global_norm(100.0), grads)
    for k in grads:
        np.testing.assert_allclose(out[k], grads[k], rtol=1e-7)


def test_all_zero_grads():
    grads = _tree(np.zeros((4, 4)))
    out = _apply(safe_clip_by_global_norm(20.0), grads)
    assert np.all(np.asarray(out["p0"]) == 0.0)


def test_overflow_scale_grads_clip_finite():
    # ~1e20 per element: each square is 1e40 > f32 max (3.4e38), so
    # optax's global norm is inf and clip/inf zeroes the whole update
    # (a silently lost step); the scaled norm must stay finite and clip
    # to exactly max_norm.
    grads = _tree(np.full((64,), 1e20), np.full((8, 8), -3e19))
    ref = _apply(optax.clip_by_global_norm(20.0), grads)
    assert np.all(np.asarray(ref["p0"]) == 0.0)  # the bug we fix
    out = _apply(safe_clip_by_global_norm(20.0), grads)
    flat = np.concatenate([np.asarray(v).ravel() for v in out.values()])
    assert np.all(np.isfinite(flat))
    np.testing.assert_allclose(np.linalg.norm(flat), 20.0, rtol=1e-5)


def test_nonfinite_grads_zero_update():
    grads = _tree([1.0, np.inf], [np.nan, 2.0])
    out = _apply(safe_clip_by_global_norm(20.0), grads)
    for k in grads:
        assert np.all(np.asarray(out[k]) == 0.0)
