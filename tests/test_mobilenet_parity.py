"""MobileNetV1 checkpoint parity + lidar conv1 replication.

An in-test torch mobilenet built exactly like the reference's
mobilenet_v1_base Sequential (ref lib/nets/mobilenet_v1.py:52-190: named
Conv2d_0 / Conv2d_<i>.{depthwise,pointwise} triples) with random weights
and BN stats, converted via utils/convert.load_mobilenet_state_dict, must
produce identical head features and tail fc7 activations.

Also covers the lidar stem imagenet bootstrap: the R-channel conv1 kernel
replicated across the BEV height slices with G/B on the meta channels
(ref lib/nets/lidarnet.py:249-267 load_imagenet_pretrained_cnn).
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from faster_rcnn_pytorch_multimodal_tpu.models.mobilenet import (
    MobileNetV1Head,
    MobileNetV1Tail,
)
from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (
    load_mobilenet_state_dict,
    mobilenet_key_to_flax,
    replicate_conv1_for_lidar,
)

# (type, stride, depth) per ref _CONV_DEFS (mobilenet_v1.py:33-49);
# Conv2d_12/13 use stride 1 ("use stride 1 for the 13th layer")
_DEFS = [("conv", 2, 32)] + [
    ("sep", s, d)
    for s, d in [
        (1, 64), (2, 128), (1, 128), (2, 256), (1, 256), (2, 512),
        (1, 512), (1, 512), (1, 512), (1, 512), (1, 512),
        (1, 1024), (1, 1024),
    ]
]


def _torch_mobilenet():
    """mobilenet_v1_base layout (ref mobilenet_v1.py:106-190)."""

    def conv_bn(cin, cout, stride):
        return tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, stride, 1, bias=False),
            tnn.BatchNorm2d(cout),
            tnn.ReLU6(inplace=True),
        )

    def conv_dw(cin, stride):
        return tnn.Sequential(
            tnn.Conv2d(cin, cin, 3, stride, 1, groups=cin, bias=False),
            tnn.BatchNorm2d(cin),
            tnn.ReLU6(inplace=True),
        )

    def conv_pw(cin, cout):
        return tnn.Sequential(
            tnn.Conv2d(cin, cout, 1, 1, 0, bias=False),
            tnn.BatchNorm2d(cout),
            tnn.ReLU6(inplace=True),
        )

    end_points = OrderedDict()
    cin = 3
    for i, (kind, stride, depth) in enumerate(_DEFS):
        if kind == "conv":
            end_points[f"Conv2d_{i}"] = conv_bn(cin, depth, stride)
        else:
            end_points[f"Conv2d_{i}"] = tnn.Sequential(
                OrderedDict(
                    [
                        ("depthwise", conv_dw(cin, stride)),
                        ("pointwise", conv_pw(cin, depth)),
                    ]
                )
            )
        cin = depth
    m = tnn.Sequential(end_points)
    torch.manual_seed(0)
    for p in m.parameters():
        p.data.normal_(0, 0.05)
    # randomized BN stats so frozen-BN folding is actually exercised
    g = torch.Generator().manual_seed(1)
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5, generator=g)
            mod.running_var.uniform_(0.5, 2.0, generator=g)
    return m.eval()


def test_mobilenet_key_map():
    assert mobilenet_key_to_flax("mobilenet.Conv2d_0.0.weight") == (
        "backbone", "conv0", "kernel")
    assert mobilenet_key_to_flax("features.Conv2d_0.1.running_mean") == (
        "backbone", "bn0", "mean")
    assert mobilenet_key_to_flax("Conv2d_3.depthwise.0.weight") == (
        "backbone", "layer3", "depthwise", "kernel")
    assert mobilenet_key_to_flax("Conv2d_3.depthwise.1.running_var") == (
        "backbone", "layer3", "dw_bn", "var")
    assert mobilenet_key_to_flax("Conv2d_11.pointwise.1.weight") == (
        "backbone", "layer11", "pw_bn", "scale")
    # layers 12-13 live in the tail (ref mobilenet_v1.py:267-270)
    assert mobilenet_key_to_flax("Conv2d_12.pointwise.0.weight") == (
        "tail", "layer12", "pointwise", "kernel")
    assert mobilenet_key_to_flax("Conv2d_13.depthwise.1.bias") == (
        "tail", "layer13", "dw_bn", "bias")
    assert mobilenet_key_to_flax("Conv2d_0.1.num_batches_tracked") is None


def test_mobilenet_forward_parity():
    tm = _torch_mobilenet()
    x = np.random.RandomState(0).randn(1, 64, 96, 3).astype(np.float32)

    head = MobileNetV1Head()
    params_h = head.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tail = MobileNetV1Tail()
    pooled_shape = (2, 7, 7, 512)
    params_t = tail.init(jax.random.PRNGKey(0), jnp.zeros(pooled_shape), True)

    merged = {"params": {"backbone": params_h["params"],
                         "tail": params_t["params"]}}
    loaded, n = load_mobilenet_state_dict(merged, tm.state_dict())
    # conv0 w + bn(4) + 13 sep layers x (dw w + dw bn(4) + pw w + pw bn(4))
    assert n == 5 + 13 * 10, n

    feats = head.apply(
        {"params": loaded["params"]["backbone"]}, jnp.asarray(x)
    )
    with torch.no_grad():
        thead = tnn.Sequential(*list(tm.children())[:12])
        tfeat = thead(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(feats), tfeat, atol=2e-4)

    pooled = np.random.RandomState(1).randn(*pooled_shape).astype(np.float32)
    fc7 = tail.apply(
        {"params": loaded["params"]["tail"]}, jnp.asarray(pooled), True
    )
    with torch.no_grad():
        ttail = tnn.Sequential(*list(tm.children())[12:])
        t7 = ttail(torch.from_numpy(pooled.transpose(0, 3, 1, 2)))
        t7 = t7.mean(3).mean(2).numpy()  # ref _head_to_tail:231-234
    np.testing.assert_allclose(np.asarray(fc7), t7, atol=2e-4)


def test_replicate_conv1_for_lidar():
    rs = np.random.RandomState(0)
    w = rs.randn(64, 3, 7, 7).astype(np.float32)
    sd = {"conv1.weight": w, "bn1.weight": np.ones(64, np.float32)}
    out = replicate_conv1_for_lidar(sd, num_slices=12, num_channel=15)
    nw = out["conv1.weight"]
    assert nw.shape == (64, 15, 7, 7)
    # slices 0..11 all carry the R kernel (ref lidarnet.py:256-259)
    for s in range(12):
        np.testing.assert_array_equal(nw[:, s], w[:, 0])
    np.testing.assert_array_equal(nw[:, 12], w[:, 1])
    np.testing.assert_array_equal(nw[:, 13], w[:, 2])
    np.testing.assert_array_equal(nw[:, 14], 0.0)
    # untouched keys ride through
    np.testing.assert_array_equal(out["bn1.weight"], sd["bn1.weight"])
