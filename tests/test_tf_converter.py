"""tf-faster-rcnn (tf-slim) checkpoint import, TF-free.

utils/convert.tf_slim_*_to_torch reimplement the reference's three
conversion scripts (ref tools/convert_from_tensorflow{,_vgg,_mobile}.py:
ordered key rewrites + HWIO->OIHW transposes).  Verified by inverse
construction: take the in-test torchvision-layout twin, rename/transpose
its state_dict BACK into tf-slim form, run the converter forward, and
assert the torch keys and values round-trip — then on through
load_resnet_state_dict to flax forward parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from faster_rcnn_pytorch_multimodal_tpu.models.resnet import ResNetC4  # noqa: E402
from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (  # noqa: E402
    load_resnet_state_dict,
    tf_slim_mobilenet_to_torch,
    tf_slim_resnet_to_torch,
    tf_slim_vgg_to_torch,
)
from tests.test_checkpoint_parity import _build_torch, _nchw  # noqa: E402

_BN_TF = {
    "weight": "BatchNorm/gamma",
    "bias": "BatchNorm/beta",
    "running_mean": "BatchNorm/moving_mean",
    "running_var": "BatchNorm/moving_variance",
}


def _torch_resnet_to_tf(sd, scope="resnet_v1_50"):
    """Inverse of tf_slim_resnet_to_torch: torchvision keys -> tf-slim
    names, torch OIHW -> tf HWIO."""
    out = {}
    for k, v in sd.items():
        v = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
        if "num_batches_tracked" in k or k.startswith("fc."):
            continue
        parts = k.split(".")
        if parts[0] == "conv1":
            name = f"{scope}/conv1/weights"
        elif parts[0] == "bn1":
            name = f"{scope}/conv1/{_BN_TF[parts[1]]}"
        else:  # layerL.i.<rest>
            lay = parts[0].replace("layer", "block")
            unit = f"unit_{int(parts[1]) + 1}"
            rest = parts[2:]
            if rest[0].startswith("conv"):
                name = f"{scope}/{lay}/{unit}/bottleneck_v1/{rest[0]}/weights"
            elif rest[0].startswith("bn"):
                cj = rest[0].replace("bn", "conv")
                name = f"{scope}/{lay}/{unit}/bottleneck_v1/{cj}/{_BN_TF[rest[1]]}"
            elif rest[0] == "downsample" and rest[1] == "0":
                name = f"{scope}/{lay}/{unit}/bottleneck_v1/shortcut/weights"
            elif rest[0] == "downsample" and rest[1] == "1":
                name = f"{scope}/{lay}/{unit}/bottleneck_v1/shortcut/{_BN_TF[rest[2]]}"
            else:
                raise AssertionError(k)
        if v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out[name] = v
    return out


def test_resnet_tf_round_trip_and_forward_parity():
    tm = _build_torch(50, use_fpn=False, seed=5)
    sd = {k: v for k, v in tm.state_dict().items()}
    tf_vars = _torch_resnet_to_tf(sd)
    # optimizer slots + global step must be dropped (ref :19-24)
    tf_vars["Variable"] = np.asarray(7)
    tf_vars["resnet_v1_50/conv1/weights/Momentum"] = np.zeros((7, 7, 3, 64))

    back = tf_slim_resnet_to_torch(tf_vars)
    # every key comes back under the reference's 'resnet.' prefix
    expect_keys = {
        "resnet." + k for k in sd
        if "num_batches_tracked" not in k and not k.startswith("fc.")
    }
    assert set(back.keys()) == expect_keys
    for k, v in back.items():
        np.testing.assert_array_equal(
            v, sd[k[len("resnet."):]].numpy(), err_msg=k
        )

    # and on through the flax loader to forward parity
    c4 = ResNetC4(num_layers=50)
    v0 = c4.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    loaded, n = load_resnet_state_dict(
        {"params": {"backbone": v0["params"]}}, back, use_fpn=False
    )
    assert n > 0
    x = np.random.RandomState(3).uniform(-2, 2, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_c4 = tm.layer3(tm.layer2(tm.layer1(tm.stem(_nchw(x)))))
    j_c4 = c4.apply({"params": loaded["params"]["backbone"]}, jnp.asarray(x))
    a = np.transpose(t_c4.numpy(), (0, 2, 3, 1))
    atol = max(3e-4, 3e-5 * float(np.abs(a).max()))
    np.testing.assert_allclose(a, np.asarray(j_c4), rtol=1e-3, atol=atol)


def test_resnet_head_keys():
    tf_vars = {
        "resnet_v1_101/rpn_conv/3x3/weights": np.zeros((3, 3, 1024, 512)),
        "resnet_v1_101/rpn_conv/3x3/biases": np.zeros(512),
        "resnet_v1_101/rpn_cls_score/weights": np.zeros((1, 1, 512, 18)),
        "resnet_v1_101/cls_score/weights": np.zeros((2048, 9)),
        "resnet_v1_101/bbox_pred/biases": np.zeros(36),
    }
    out = tf_slim_resnet_to_torch(tf_vars)
    assert out["rpn_net.weight"].shape == (512, 1024, 3, 3)
    assert out["rpn_net.bias"].shape == (512,)
    assert out["rpn_cls_score_net.weight"].shape == (18, 512, 1, 1)
    assert out["cls_score_net.weight"].shape == (9, 2048)
    assert out["bbox_pred_net.bias"].shape == (36,)


def test_vgg_fc6_spatial_reshape():
    """fc6 flattens 7x7x512 HWC in tf but CHW in torch (ref
    convert_from_tensorflow_vgg.py:70-72): a known per-position weight
    must land at the torch-flat index."""
    w_tf = np.zeros((7 * 7 * 512, 4096), np.float32)
    # tf-flat index of (h=2, w=3, c=100)
    tf_idx = (2 * 7 + 3) * 512 + 100
    w_tf[tf_idx, 7] = 1.0
    out = tf_slim_vgg_to_torch({
        "vgg_16/fc6/weights": w_tf,
        "vgg_16/conv1/conv1_1/weights": np.zeros((3, 3, 3, 64)),
        "vgg_16/fc7/biases": np.zeros(4096),
    })
    w_t = out["vgg.classifier.0.weight"]
    assert w_t.shape == (4096, 25088)
    torch_idx = (100 * 7 + 2) * 7 + 3  # CHW-flat
    assert w_t[7, torch_idx] == 1.0
    assert out["vgg.features.0.weight"].shape == (64, 3, 3, 3)
    assert out["vgg.classifier.3.bias"].shape == (4096,)


def test_mobilenet_keys_and_depthwise():
    tf_vars = {
        "MobilenetV1/Conv2d_0/weights": np.zeros((3, 3, 3, 32)),
        "MobilenetV1/Conv2d_0/BatchNorm/gamma": np.zeros(32),
        "MobilenetV1/Conv2d_3_depthwise/depthwise_weights": np.zeros((3, 3, 128, 1)),
        "MobilenetV1/Conv2d_3_depthwise/BatchNorm/moving_mean": np.zeros(128),
        "MobilenetV1/Conv2d_3_pointwise/weights": np.zeros((1, 1, 128, 128)),
        "MobilenetV1/Conv2d_3_pointwise/BatchNorm/beta": np.zeros(128),
    }
    out = tf_slim_mobilenet_to_torch(tf_vars)
    assert out["mobilenet.Conv2d_0.0.weight"].shape == (32, 3, 3, 3)
    assert out["mobilenet.Conv2d_0.1.weight"].shape == (32,)
    # depthwise HWC1 -> torch (C, 1, H, W) (ref _mobile.py:61-63)
    assert out["mobilenet.Conv2d_3.depthwise.0.weight"].shape == (128, 1, 3, 3)
    assert out["mobilenet.Conv2d_3.depthwise.1.running_mean"].shape == (128,)
    assert out["mobilenet.Conv2d_3.pointwise.0.weight"].shape == (128, 128, 1, 1)
    assert out["mobilenet.Conv2d_3.pointwise.1.bias"].shape == (128,)
