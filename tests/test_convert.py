"""torch->flax weight conversion: key mapping, transposes, placement."""

import numpy as np
import jax
import jax.numpy as jnp

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.models.detector import FasterRCNN
from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (
    convert_tensor,
    load_resnet_state_dict,
    resnet_key_to_flax,
)


def test_convert_tensor_transposes():
    conv = np.zeros((64, 3, 7, 7))
    assert convert_tensor("conv1.weight", conv).shape == (7, 7, 3, 64)
    lin = np.zeros((10, 20))
    assert convert_tensor("fc.weight", lin).shape == (20, 10)
    bn = np.zeros((64,))
    assert convert_tensor("bn1.weight", bn).shape == (64,)


def test_key_mapping():
    assert resnet_key_to_flax("conv1.weight", False) == (
        "backbone", "stem", "conv1", "kernel")
    assert resnet_key_to_flax("bn1.running_mean", False) == (
        "backbone", "stem", "bn1", "mean")
    assert resnet_key_to_flax("layer2.0.downsample.0.weight", False) == (
        "backbone", "layer2", "block0", "downsample_conv", "kernel")
    assert resnet_key_to_flax("layer2.0.downsample.1.running_var", False) == (
        "backbone", "layer2", "block0", "downsample_bn", "var")
    assert resnet_key_to_flax("layer1.1.conv2.weight", False) == (
        "backbone", "layer1", "block1", "conv2", "kernel")
    # layer4 -> C4 tail without FPN, backbone with FPN
    assert resnet_key_to_flax("layer4.0.conv1.weight", False)[0] == "tail"
    assert resnet_key_to_flax("layer4.0.conv1.weight", True)[0] == "backbone"
    assert resnet_key_to_flax("fc.weight", False) is None
    assert resnet_key_to_flax("bn1.num_batches_tracked", False) is None


def test_load_resnet18_state_dict_into_model():
    cfg = cfg_from_list(default_config(), (
        "NET_TYPE", "image", "NET_VARIANT", "res18",
        "TEST.RPN_POST_NMS_TOP_N", "16", "STATIC.NMS_PRE_TEST", "64",
        "ANCHOR_SCALES", "[4]", "ANCHOR_RATIOS", "[1]",
    ))
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 64, 96, 3)),
        jnp.asarray([[0.0, 96, 0, 64]]),
    )
    # synthesize a torch-style resnet18 state dict with marker values
    sd = {
        "conv1.weight": np.full((64, 3, 7, 7), 0.5, np.float32),
        "bn1.weight": np.full((64,), 2.0, np.float32),
        "bn1.running_var": np.full((64,), 4.0, np.float32),
        "layer1.0.conv1.weight": np.full((64, 64, 3, 3), 0.25, np.float32),
        "layer4.1.conv2.weight": np.full((512, 512, 3, 3), 0.125, np.float32),
        "fc.weight": np.zeros((1000, 512), np.float32),  # dropped
    }
    new, n = load_resnet_state_dict(params, sd, use_fpn=False)
    assert n == 5
    p = new["params"]
    np.testing.assert_allclose(p["backbone"]["stem"]["conv1"]["kernel"], 0.5)
    np.testing.assert_allclose(p["backbone"]["stem"]["bn1"]["scale"], 2.0)
    np.testing.assert_allclose(p["backbone"]["stem"]["bn1"]["var"], 4.0)
    np.testing.assert_allclose(
        p["backbone"]["layer1"]["block0"]["conv1"]["kernel"], 0.25
    )
    np.testing.assert_allclose(
        p["tail"]["layer4"]["block1"]["conv2"]["kernel"], 0.125
    )
    # untouched params unchanged
    np.testing.assert_allclose(
        p["rpn"]["rpn_net"]["kernel"],
        params["params"]["rpn"]["rpn_net"]["kernel"],
    )


def test_reconcile_bn_stats_cross_mode():
    """Live-BN checkpoints load into frozen-BN models and vice versa
    (torch keeps running stats in the state dict at every FIXED_BLOCKS)."""
    from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (
        reconcile_bn_stats,
    )

    # live-BN training layout: stats in batch_stats, no mean/var in params
    live = {
        "params": {"bb": {"bn": {"scale": np.full(4, 2.0), "bias": np.zeros(4)}}},
        "batch_stats": {"bb": {"bn": {"mean": np.full(4, 5.0), "var": np.full(4, 9.0)}}},
    }
    # frozen-BN eval layout: mean/var are (masked-out) params
    frozen_tmpl = {
        "params": {
            "bb": {
                "bn": {
                    "scale": np.ones(4),
                    "bias": np.zeros(4),
                    "mean": np.zeros(4),
                    "var": np.ones(4),
                }
            }
        }
    }
    out = reconcile_bn_stats(frozen_tmpl, live, verbose=False)
    np.testing.assert_allclose(out["params"]["bb"]["bn"]["mean"], 5.0)
    np.testing.assert_allclose(out["params"]["bb"]["bn"]["var"], 9.0)
    np.testing.assert_allclose(out["params"]["bb"]["bn"]["scale"], 2.0)

    # frozen checkpoint -> live model (preload into from-scratch training)
    live_tmpl = {
        "params": {"bb": {"bn": {"scale": np.ones(4), "bias": np.zeros(4)}}},
        "batch_stats": {"bb": {"bn": {"mean": np.zeros(4), "var": np.ones(4)}}},
    }
    frozen = {
        "params": {
            "bb": {
                "bn": {
                    "scale": np.full(4, 3.0),
                    "bias": np.zeros(4),
                    "mean": np.full(4, 7.0),
                    "var": np.full(4, 2.0),
                }
            }
        }
    }
    out = reconcile_bn_stats(live_tmpl, frozen, verbose=False)
    np.testing.assert_allclose(out["batch_stats"]["bb"]["bn"]["mean"], 7.0)
    np.testing.assert_allclose(out["batch_stats"]["bb"]["bn"]["var"], 2.0)
    np.testing.assert_allclose(out["params"]["bb"]["bn"]["scale"], 3.0)

    # shape mismatch falls back to template init values
    bad = {"params": {"bb": {"bn": {"scale": np.ones(8)}}}}
    out = reconcile_bn_stats(frozen_tmpl, bad, verbose=False)
    np.testing.assert_allclose(out["params"]["bb"]["bn"]["scale"], 1.0)
