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


def test_bayes_variant_knob_reaches_detector():
    """UC.BAYES_VARIANT selects among the reference's three Bayesian CE
    formulations (ref loss_utils.py:149-209) inside forward_train."""
    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_multimodal_tpu.config import (
        cfg_from_list,
        default_config,
    )
    from faster_rcnn_pytorch_multimodal_tpu.data import (
        BatchLoader,
        SyntheticDataset,
    )
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN

    base = (
        "NET_TYPE", "image", "NET_VARIANT", "res18",
        "TRAIN.RPN_POST_NMS_TOP_N", "32", "TRAIN.ROI_BATCH_SIZE", "16",
        "STATIC.NMS_PRE_TRAIN", "128", "STATIC.MAX_GT", "8",
        "ANCHOR_SCALES", "[2,4]", "ANCHOR_RATIOS", "[1]",
        "PIXEL_STDDEVS", "[60.,60.,60.]",
        "UC.EN_CLS_ALEATORIC", "True", "UC.A_NUM_CE_SAMPLE", "8",
    )
    losses = {}
    for variant in ("full", "simple", "elu"):
        cfg = cfg_from_list(default_config(), base + ("UC.BAYES_VARIANT", variant))
        ds = SyntheticDataset(cfg, num_frames=2, num_classes=2, image_hw=(64, 96))
        loader = BatchLoader(ds, cfg, batch_size=1, seed=0, augment=False)
        model = FasterRCNN(cfg=cfg, num_classes=2)
        rng = jax.random.PRNGKey(0)
        batch = loader.next()
        params = model.init(
            {"params": rng, "dropout": rng},
            jnp.asarray(batch["data"]), jnp.asarray(batch["window"]),
        )
        out = model.apply(
            params, jnp.asarray(batch["data"]), jnp.asarray(batch["gt_boxes"]),
            jnp.asarray(batch["gt_mask"]), jnp.asarray(batch["window"]), rng,
            method=FasterRCNN.forward_train, rngs={"dropout": rng},
        )
        losses[variant] = float(out["cross_entropy"])
        assert np.isfinite(losses[variant]), variant
    # the three formulations are genuinely different functions
    assert len({round(v, 6) for v in losses.values()}) == 3, losses
