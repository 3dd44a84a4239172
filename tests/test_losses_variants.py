"""The two alternative Bayesian CE variants (ref loss_utils.py:171-209)."""

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.ops.losses import (
    bayesian_cross_entropy_simple,
    bayesian_elu_cross_entropy,
    cross_entropy,
)


def _case(seed=0, n=16, c=5):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, c, n))
    return logits, labels


def test_simple_variant_matches_ce_at_zero_var():
    logits, labels = _case()
    var = jnp.full(logits.shape, 1e-10)
    loss, mi = bayesian_cross_entropy_simple(
        logits, var, labels, 64, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(float(loss), float(cross_entropy(logits, labels)), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mi), 0.0, atol=1e-3)


def test_elu_variant_zero_var_reduces_to_plain_ce():
    # at var -> 0: dist == undist, diff_elu -> 0, regularizer exp(0)-1 = 0
    logits, labels = _case(1)
    var = jnp.full(logits.shape, 1e-10)
    loss, _ = bayesian_elu_cross_entropy(logits, var, labels, 64, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss), float(cross_entropy(logits, labels)), rtol=1e-2)


def test_elu_variant_penalizes_variance_on_correct_preds():
    # strongly-correct logits: variance cannot reduce the loss, and the
    # exp-regularizer grows it
    logits = jnp.asarray([[6.0, 0.0]] * 8)
    labels = jnp.zeros(8, jnp.int32)
    lo, _ = bayesian_elu_cross_entropy(
        logits, jnp.full((8, 2), 1e-6), labels, 128, jax.random.PRNGKey(2)
    )
    hi, _ = bayesian_elu_cross_entropy(
        logits, jnp.full((8, 2), 2.0), labels, 128, jax.random.PRNGKey(2)
    )
    assert float(hi) > float(lo)
