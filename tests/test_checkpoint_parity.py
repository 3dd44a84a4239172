"""Checkpoint-parity harness: torch reference modules -> utils/convert.py ->
layer-wise + end-to-end forward parity against the flax backbone.

BASELINE.json's bar is "detections matching the reference on its
checkpoints"; the reference loads torchvision-format resnet state dicts
(ref lib/nets/resnet.py:242-295 model-zoo loaders, lib/nets/imagenet.py:
174-237 staged loaders).  torchvision is not installed here, so a
torchvision-compatible torch ResNet is constructed IN-TEST, including the
reference's detection surgery (ref resnet.py:227-240):
  * caffe stride moves on layers 2-3 (stride to conv1, conv2 stride 1),
  * stride-1 layer4 (conv2 + downsample) when no FPN.

Every test randomizes BN running stats and affine params so a wrong key
map, transpose, stride placement, or BN epsilon fails loudly.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from faster_rcnn_pytorch_multimodal_tpu.models.resnet import (  # noqa: E402
    ResNetC4,
    ResNetLayer4,
    ResNetPyramid,
)
from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (  # noqa: E402
    convert_tensor,
    load_resnet_state_dict,
)

# ---------------------------------------------------------------------------
# In-test torch reference model (torchvision-compatible state_dict keys)
# ---------------------------------------------------------------------------


def _conv3x3(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)


def _conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = _conv1x1(inplanes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = _conv3x3(planes, planes, stride)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = _conv1x1(planes, planes * 4)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = _conv3x3(inplanes, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = _conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(nn.Module):
    """torchvision-layout resnet + the reference's ResNetWrapper surgery."""

    def __init__(self, block, layers, use_fpn=False):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        # ref resnet.py:231-234 caffe stride moves (bottleneck depths only —
        # the reference never builds res18/34 without FPN surgery applying,
        # but conv1/conv2 stride swap is a no-op check for BasicBlock which
        # has no conv1x1; reference only runs this loop which touches conv1/
        # conv2 attributes that exist on both block types)
        for i in range(2, 4):
            layer = getattr(self, f"layer{i}")
            layer[0].conv1.stride = (2, 2)
            layer[0].conv2.stride = (1, 1)
        if not use_fpn:
            # ref resnet.py:236-238 stride-1 layer4
            self.layer4[0].conv2.stride = (1, 1)
            if self.layer4[0].downsample is not None:
                self.layer4[0].downsample[0].stride = (1, 1)
            if isinstance(self.layer4[0], TorchBasicBlock):
                self.layer4[0].conv1.stride = (1, 1)

    def _make_layer(self, block, planes, n, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                _conv1x1(self.inplanes, planes * block.expansion, stride),
                nn.BatchNorm2d(planes * block.expansion),
            )
        blocks = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, n):
            blocks.append(block(self.inplanes, planes))
        return nn.Sequential(*blocks)

    def stem(self, x):
        return self.maxpool(self.relu(self.bn1(self.conv1(x))))


def _randomize_bn(model: nn.Module, gen: torch.Generator):
    """Non-trivial running stats + affines: catches eps/key-map errors that
    identity stats would hide."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)
                m.weight.normal_(1.0, 0.2, generator=gen)
                m.bias.normal_(0.0, 0.2, generator=gen)


def _build_torch(depth: int, use_fpn: bool, seed: int = 0) -> TorchResNet:
    torch.manual_seed(seed)
    block = TorchBasicBlock if depth in (18, 34) else TorchBottleneck
    layers = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    model = TorchResNet(block, layers, use_fpn=use_fpn)
    _randomize_bn(model, torch.Generator().manual_seed(seed + 1))
    model.eval()
    return model


def _loadable_keys(sd) -> int:
    return sum(
        1
        for k in sd
        if "num_batches_tracked" not in k and not k.startswith("fc.")
    )


def _flax_c4_params(depth: int, rng):
    """Param tree shaped like the detector's (backbone + tail scopes)."""
    c4 = ResNetC4(num_layers=depth)
    tail = ResNetLayer4(num_layers=depth)
    cdim = 256 if depth in (18, 34) else 1024  # layer3 output channels
    v1 = c4.init(rng, jnp.zeros((1, 64, 64, 3)))
    v2 = tail.init(rng, jnp.zeros((1, 7, 7, cdim)))
    return c4, tail, {
        "params": {"backbone": v1["params"], "tail": v2["params"]}
    }


def _nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _assert_close(torch_out: torch.Tensor, jax_out, name: str, atol=1e-4):
    a = np.transpose(torch_out.detach().numpy(), (0, 2, 3, 1))
    b = np.asarray(jax_out)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=atol, err_msg=name)


@pytest.mark.parametrize("depth", [18, 50, 101])
def test_c4_forward_parity(depth):
    """stage-wise + end-to-end: torch reference C4 (stem..layer3) ==
    converted flax backbone, layer4 tail included (atol 1e-4 fp32)."""
    tm = _build_torch(depth, use_fpn=False, seed=depth)
    sd = tm.state_dict()

    rng = jax.random.PRNGKey(0)
    c4, tail, params = _flax_c4_params(depth, rng)
    loaded, n = load_resnet_state_dict(params, sd, use_fpn=False)
    assert n == _loadable_keys(sd), "every loadable tensor must map"

    x = np.random.RandomState(7).uniform(-2, 2, (1, 64, 64, 3)).astype(np.float32)
    tx = _nchw(x)

    with torch.no_grad():
        t_stem = tm.stem(tx)
        t_c2 = tm.layer1(t_stem)
        t_c3 = tm.layer2(t_c2)
        t_c4 = tm.layer3(t_c3)
        t_c5 = tm.layer4(t_c4)

    bk = loaded["params"]["backbone"]

    # stage-wise through the flax backbone's submodules
    from faster_rcnn_pytorch_multimodal_tpu.models.resnet import (
        ResNetStem,
        ResStage,
        STAGE_BLOCKS,
        BASIC_DEPTHS,
    )

    blocks = STAGE_BLOCKS[depth]
    basic = depth in BASIC_DEPTHS
    j_stem = ResNetStem().apply({"params": bk["stem"]}, jnp.asarray(x))
    _assert_close(t_stem, j_stem, "stem")

    j = j_stem
    for i, (planes, nb, stride, caffe) in enumerate(
        [(64, blocks[0], 1, False), (128, blocks[1], 2, True), (256, blocks[2], 2, True)]
    ):
        stage = ResStage(planes, nb, stride, caffe_stride=caffe, basic=basic)
        j = stage.apply({"params": bk[f"layer{i + 1}"]}, j, True)
        _assert_close([t_c2, t_c3, t_c4][i], j, f"layer{i + 1}")

    # end-to-end through the public modules
    j_c4 = c4.apply({"params": bk}, jnp.asarray(x))
    _assert_close(t_c4, j_c4, "backbone e2e")
    j_c5 = tail.apply({"params": loaded["params"]["tail"]}, j_c4)
    _assert_close(t_c5, j_c5, "stride-1 layer4 tail", atol=3e-4)


def test_fpn_pyramid_parity():
    """FPN wiring: layer4 keeps stride 2 and lives in the backbone scope."""
    depth = 50
    tm = _build_torch(depth, use_fpn=True, seed=99)
    sd = tm.state_dict()

    rng = jax.random.PRNGKey(0)
    pyr = ResNetPyramid(num_layers=depth)
    v = pyr.init(rng, jnp.zeros((1, 64, 64, 3)))
    params = {"params": {"backbone": v["params"]}}
    loaded, n = load_resnet_state_dict(params, sd, use_fpn=True)
    assert n == _loadable_keys(sd)

    x = np.random.RandomState(3).uniform(-2, 2, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t = _nchw(x)
        t_c2 = tm.layer1(tm.stem(t))
        t_c3 = tm.layer2(t_c2)
        t_c4 = tm.layer3(t_c3)
        t_c5 = tm.layer4(t_c4)
    j_c2, j_c3, j_c4, j_c5 = pyr.apply(
        {"params": loaded["params"]["backbone"]}, jnp.asarray(x)
    )
    for name, tt, jj in [
        ("c2", t_c2, j_c2),
        ("c3", t_c3, j_c3),
        ("c4", t_c4, j_c4),
        ("c5", t_c5, j_c5),
    ]:
        _assert_close(tt, jj, name, atol=3e-4)
    assert j_c5.shape[1] == j_c4.shape[1] // 2, "FPN layer4 must stride 2"


def test_linear_head_conversion():
    """fc-head parity: torch Linear -> convert_tensor -> flax Dense."""
    import flax.linen as fnn

    torch.manual_seed(5)
    lin = nn.Linear(32, 12)
    x = np.random.RandomState(1).randn(4, 32).astype(np.float32)
    with torch.no_grad():
        t_out = lin(torch.from_numpy(x)).numpy()
    dense = fnn.Dense(12)
    params = {
        "params": {
            "kernel": jnp.asarray(convert_tensor("weight", lin.weight)),
            "bias": jnp.asarray(convert_tensor("bias", lin.bias)),
        }
    }
    j_out = dense.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(t_out, np.asarray(j_out), rtol=1e-5, atol=1e-5)


def test_diagonal_decode_parity_vs_torch():
    """The nonstandard diagonal-normalized decode (the checkpoint
    compatibility surface, ref bbox_transform.py:75-105) computed with the
    reference's exact torch formulation must match ops.box_transform."""
    from faster_rcnn_pytorch_multimodal_tpu.ops.box_transform import (
        bbox_transform,
        bbox_transform_inv,
    )

    rs = np.random.RandomState(11)
    boxes = np.sort(rs.uniform(0, 100, (16, 2, 2)), axis=2)
    boxes = np.concatenate([boxes[:, :, 0], boxes[:, :, 1]], axis=1).astype(
        np.float32
    )  # x1 y1 x2 y2 with x1<x2, y1<y2
    deltas = rs.uniform(-0.3, 0.3, (16, 8)).astype(np.float32)

    tb = torch.from_numpy(boxes)
    td = torch.from_numpy(deltas)
    w = tb[:, 2] - tb[:, 0] + 1.0
    h = tb[:, 3] - tb[:, 1] + 1.0
    area = torch.sqrt(w**2 + h**2)
    cx = tb[:, 0] + 0.5 * w
    cy = tb[:, 1] + 0.5 * h
    dx, dy, dw, dh = td[:, 0::4], td[:, 1::4], td[:, 2::4], td[:, 3::4]
    pcx = dx * area.unsqueeze(1) + cx.unsqueeze(1)
    pcy = dy * area.unsqueeze(1) + cy.unsqueeze(1)
    pw = torch.exp(dw) * w.unsqueeze(1)
    ph = torch.exp(dh) * h.unsqueeze(1)
    t_out = torch.cat(
        [
            u.unsqueeze(2)
            for u in [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph]
        ],
        2,
    ).view(16, -1)

    j_out = bbox_transform_inv(jnp.asarray(boxes), jnp.asarray(deltas))
    np.testing.assert_allclose(
        t_out.numpy(), np.asarray(j_out), rtol=1e-5, atol=1e-4
    )

    # encode/decode round trip: the reference's decode omits the -1 that
    # encode's +1 widths imply, so x2/y2 come back exactly +1 px (replicated
    # quirk — checkpoints bake it in)
    gt = np.sort(rs.uniform(0, 100, (16, 2, 2)), axis=2)
    gt = np.concatenate([gt[:, :, 0], gt[:, :, 1]], axis=1).astype(np.float32)
    enc = bbox_transform(jnp.asarray(boxes), jnp.asarray(gt))
    dec = np.asarray(bbox_transform_inv(jnp.asarray(boxes), enc.reshape(16, 4)))
    expected = gt + np.asarray([0.0, 0.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(dec, expected, rtol=1e-4, atol=1e-3)


def test_lidar_stem_bootstrap_parity():
    """The BEV stem's imagenet bootstrap (ref lib/nets/lidarnet.py:249-267):
    the R-channel conv1 kernel replicated over the 12 height slices + G/B
    on the meta channels must load into the 15-channel flax stem and match
    a torch stem carrying the same replicated weights."""
    from faster_rcnn_pytorch_multimodal_tpu.models.resnet import ResNetStem
    from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (
        replicate_conv1_for_lidar,
    )

    torch.manual_seed(3)
    conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    bn1 = nn.BatchNorm2d(64)
    _randomize_bn(nn.Sequential(bn1), torch.Generator().manual_seed(4))
    sd = {"conv1.weight": conv1.weight, **{
        f"bn1.{k}": v for k, v in bn1.state_dict().items()
    }}
    sd15 = replicate_conv1_for_lidar(sd, num_slices=12, num_channel=15)

    raster = np.random.RandomState(5).uniform(
        -1, 1, (1, 64, 64, 15)
    ).astype(np.float32)
    stem = ResNetStem()
    v = stem.init(jax.random.PRNGKey(0), jnp.asarray(raster))
    params = {"params": {"backbone": {"stem": v["params"]}}}
    loaded, n = load_resnet_state_dict(params, sd15, use_fpn=False)
    assert n == 5, n  # conv1 kernel + 4 bn leaves
    j_out = stem.apply(
        {"params": loaded["params"]["backbone"]["stem"]}, jnp.asarray(raster)
    )

    tconv = nn.Conv2d(15, 64, 7, stride=2, padding=3, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(sd15["conv1.weight"]))
    tstem = nn.Sequential(
        tconv, bn1, nn.ReLU(), nn.MaxPool2d(3, stride=2, padding=1)
    ).eval()
    with torch.no_grad():
        t_out = tstem(_nchw(raster))
    _assert_close(t_out, j_out, "lidar stem bootstrap")
