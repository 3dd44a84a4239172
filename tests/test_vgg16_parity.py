"""VGG16 checkpoint parity: an in-test torch vgg16 (torchvision layout,
random weights) converted via utils/convert.load_vgg16_state_dict must
produce identical head features and tail fc7 activations — including the
fc6 CHW->HWC flattening permutation (ref tools/convert_from_tensorflow_vgg
handled the same trap for tf checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from faster_rcnn_pytorch_multimodal_tpu.models.vgg16 import VGG16Head, VGG16Tail
from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (
    load_vgg16_state_dict,
    vgg16_key_to_flax,
)

_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
        512, 512, 512, "M"]


def _torch_vgg16():
    """torchvision.models.vgg16 layout, built inline (~the torchvision
    make_layers code path) with random weights."""
    layers = []
    in_ch = 3
    for v in _CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=True))
            in_ch = v
    features = tnn.Sequential(*layers)
    classifier = tnn.Sequential(
        tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(True), tnn.Dropout(),
        tnn.Linear(4096, 4096), tnn.ReLU(True), tnn.Dropout(),
        tnn.Linear(4096, 1000),
    )

    class VGG(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = features
            self.classifier = classifier

    m = VGG()
    torch.manual_seed(0)
    for p in m.parameters():
        p.data.normal_(0, 0.02)
    return m.eval()


def test_vgg16_key_map():
    assert vgg16_key_to_flax("features.0.weight") == (
        "backbone", "early_conv0", "kernel")
    assert vgg16_key_to_flax("features.28.bias") == (
        "backbone", "late_conv12", "bias")
    assert vgg16_key_to_flax("classifier.0.weight") == ("tail", "fc6", "kernel")
    assert vgg16_key_to_flax("classifier.3.bias") == ("tail", "fc7", "bias")
    assert vgg16_key_to_flax("classifier.6.weight") is None  # imagenet head
    assert vgg16_key_to_flax("features.4.weight") is None  # a pool index


def test_vgg16_forward_parity():
    tm = _torch_vgg16()
    x = np.random.RandomState(0).randn(1, 64, 96, 3).astype(np.float32)

    head = VGG16Head()
    params_h = head.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tail = VGG16Tail()
    pooled_shape = (2, 7, 7, 512)
    params_t = tail.init(
        jax.random.PRNGKey(0), jnp.zeros(pooled_shape), True
    )

    merged = {"params": {"backbone": params_h["params"],
                         "tail": params_t["params"]}}
    loaded, n = load_vgg16_state_dict(merged, tm.state_dict())
    assert n == 13 * 2 + 4, n  # 13 convs (w+b) + fc6/fc7 (w+b)

    # head parity: our head applies convs up to conv5_3 without the last
    # pool (torchvision features[:-1], ref vgg16.py:49-53)
    feats = head.apply(
        {"params": loaded["params"]["backbone"]}, jnp.asarray(x)
    )
    with torch.no_grad():
        tfeat = tm.features[:-1](
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(feats), tfeat, atol=2e-4)

    # tail parity on a pooled RoI batch: fc6 row-permutation must line up
    pooled = np.random.RandomState(1).randn(*pooled_shape).astype(np.float32)
    fc7 = tail.apply(
        {"params": loaded["params"]["tail"]}, jnp.asarray(pooled), True
    )
    with torch.no_grad():
        tp = torch.from_numpy(pooled.transpose(0, 3, 1, 2)).flatten(1)
        t6 = torch.relu(tm.classifier[0](tp))
        t7 = torch.relu(tm.classifier[3](t6)).numpy()
    np.testing.assert_allclose(np.asarray(fc7), t7, atol=2e-4)
