"""Parity against the REFERENCE'S OWN torch modules (not hand-built twins).

test_checkpoint_parity.py proves the converter against in-test torch models
constructed from the builder's reading of the reference — a systematic
misreading would pass those.  This suite kills that risk: it imports the
reference's actual `lib/nets/resnet.py` (ResNetWrapper with the caffe
stride surgery, ref resnet.py:227-240) and `lib/nets/mobilenet_v1.py`
(mobilenet_v1_base, ref mobilenet_v1.py:52-190), randomizes their weights
and BN stats, exports the state_dict through utils/convert.py, and asserts
stage-wise forward equality on the flax side.

Import shims (the reference tree is read-only and its deps are absent):
  * `easydict` — a minimal attribute-dict stand-in (the real package is a
    ~30-line utility; only attribute get/set is needed by ref config.py).
  * `nets.network` — the reference repo DOES NOT SHIP network.py (its
    own README documents the missing base class); mobilenet_v1.py only
    needs the name `Network` to exist to define its (unused here) class.

vgg16 is NOT covered here: the reference's conv stack comes from
torchvision `models.vgg16()` (ref vgg16.py:35), which it does not define
and which is not installed — there is no reference-authored module to
compare against.  tests/test_checkpoint_parity.py's torchvision-layout
twin remains the vgg16 oracle.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from faster_rcnn_pytorch_multimodal_tpu.models.mobilenet import (  # noqa: E402
    MobileNetV1Head,
    MobileNetV1Tail,
)
from faster_rcnn_pytorch_multimodal_tpu.models.resnet import (  # noqa: E402
    ResNetC4,
    ResNetLayer4,
    ResNetPyramid,
)
from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (  # noqa: E402
    load_mobilenet_state_dict,
    load_resnet_state_dict,
)

REF_LIB = "/root/reference/lib"


class _EasyDict(dict):
    """Just enough of easydict for the reference config module."""

    def __init__(self, d=None, **kw):
        super().__init__()
        for k, v in dict(d or {}, **kw).items():
            setattr(self, k, v)

    def __setattr__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, _EasyDict):
            v = _EasyDict(v)
        super().__setattr__(k, v)
        super().__setitem__(k, v)

    __setitem__ = __setattr__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


@pytest.fixture(scope="module")
def ref_nets():
    """Import the reference's nets package with the dependency shims."""
    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")
        m.EasyDict = _EasyDict
        sys.modules["easydict"] = m
    if REF_LIB not in sys.path:
        sys.path.append(REF_LIB)
    # the reference does not ship nets/network.py (absent upstream);
    # mobilenet_v1.py only needs the class name to define its wrapper
    if "nets.network" not in sys.modules:
        import nets  # noqa: F401  (reference package)

        stub = types.ModuleType("nets.network")

        class Network:  # pragma: no cover - never instantiated
            pass

        stub.Network = Network
        sys.modules["nets.network"] = stub
    import nets.mobilenet_v1 as ref_mobilenet
    import nets.resnet as ref_resnet
    from model.config import cfg as ref_cfg

    return types.SimpleNamespace(
        resnet=ref_resnet, mobilenet=ref_mobilenet, cfg=ref_cfg
    )


def _randomize(model: nn.Module, seed: int):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0.0, 0.05, generator=g)
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.normal_(1.0, 0.2, generator=g)
                m.bias.normal_(0.0, 0.2, generator=g)
    model.eval()
    return model


def _nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _close(t: torch.Tensor, j, name: str, atol=3e-4):
    a = np.transpose(t.detach().numpy(), (0, 2, 3, 1))
    # randomized weights grow activations to O(100s) through deep stacks;
    # scale the absolute tolerance with the activation magnitude so the
    # check stays as strict as fp32 accumulation allows at every depth
    atol = max(atol, 3e-5 * float(np.abs(a).max()))
    np.testing.assert_allclose(a, np.asarray(j), rtol=1e-3, atol=atol, err_msg=name)


def _ref_stem(tm, tx):
    return tm.maxpool(tm.relu(tm.bn1(tm.conv1(tx))))


def _loadable(sd) -> int:
    return sum(
        1 for k in sd if "num_batches_tracked" not in k and not k.startswith("fc.")
    )


@pytest.mark.parametrize("depth", [50, 101])
def test_reference_resnet_c4_parity(ref_nets, depth):
    """Reference ResNetWrapper (caffe strides + stride-1 layer4,
    ref resnet.py:227-240) -> utils/convert -> flax C4 + layer4 tail."""
    ref_nets.cfg.USE_FPN = False
    build = getattr(ref_nets.resnet, f"resnet{depth}")
    tm = _randomize(build(pretrained=False), seed=depth)
    sd = tm.state_dict()

    rng = jax.random.PRNGKey(0)
    c4 = ResNetC4(num_layers=depth)
    tail = ResNetLayer4(num_layers=depth)
    v1 = c4.init(rng, jnp.zeros((1, 64, 64, 3)))
    v2 = tail.init(rng, jnp.zeros((1, 7, 7, 1024)))
    params = {"params": {"backbone": v1["params"], "tail": v2["params"]}}
    loaded, n = load_resnet_state_dict(params, sd, use_fpn=False)
    assert n == _loadable(sd), "every loadable reference tensor must map"

    x = np.random.RandomState(depth).uniform(-2, 2, (1, 64, 64, 3)).astype(
        np.float32
    )
    tx = _nchw(x)
    with torch.no_grad():
        t_c4 = tm.layer3(tm.layer2(tm.layer1(_ref_stem(tm, tx))))
        t_c5 = tm.layer4(t_c4)

    j_c4 = c4.apply({"params": loaded["params"]["backbone"]}, jnp.asarray(x))
    _close(t_c4, j_c4, f"res{depth} backbone vs reference module")
    j_c5 = tail.apply({"params": loaded["params"]["tail"]}, j_c4)
    _close(t_c5, j_c5, f"res{depth} stride-1 layer4 vs reference module")


def test_reference_resnet18_builder_is_broken(ref_nets):
    """The reference's OWN resnet18/34 builders are dead code: ResNet.
    _make_layer always forwards dropout_en/batchnorm_en to the block
    (ref resnet.py:199-206) but BasicBlock accepts neither
    (ref resnet.py:37-44) -> TypeError on construction.  Upstream only
    ever instantiates Bottleneck depths, so res18 parity cannot be proven
    against the reference module; the torchvision-layout twin in
    tests/test_checkpoint_parity.py stays the res18 oracle, and the repo's
    working stride-1 BasicBlock layer4 remains a documented deviation."""
    ref_nets.cfg.USE_FPN = False
    with pytest.raises(TypeError):
        ref_nets.resnet.resnet18(pretrained=False)


def test_reference_resnet_fpn_parity(ref_nets):
    """USE_FPN=True: no layer4 surgery — stride-2 layer4 inside the
    backbone scope (ref resnet.py:236 gate)."""
    ref_nets.cfg.USE_FPN = True
    try:
        tm = _randomize(ref_nets.resnet.resnet50(pretrained=False), seed=7)
    finally:
        ref_nets.cfg.USE_FPN = False
    sd = tm.state_dict()

    pyr = ResNetPyramid(num_layers=50)
    v = pyr.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = {"params": {"backbone": v["params"]}}
    loaded, n = load_resnet_state_dict(params, sd, use_fpn=True)
    assert n == _loadable(sd)

    x = np.random.RandomState(3).uniform(-2, 2, (1, 64, 64, 3)).astype(np.float32)
    tx = _nchw(x)
    with torch.no_grad():
        t_c2 = tm.layer1(_ref_stem(tm, tx))
        t_c3 = tm.layer2(t_c2)
        t_c4 = tm.layer3(t_c3)
        t_c5 = tm.layer4(t_c4)
    j_c2, j_c3, j_c4, j_c5 = pyr.apply(
        {"params": loaded["params"]["backbone"]}, jnp.asarray(x)
    )
    for name, tt, jj in [("c2", t_c2, j_c2), ("c3", t_c3, j_c3),
                         ("c4", t_c4, j_c4), ("c5", t_c5, j_c5)]:
        _close(tt, jj, f"fpn {name} vs reference module")
    assert j_c5.shape[1] == j_c4.shape[1] // 2


def test_reference_mobilenet_parity(ref_nets):
    """Reference mobilenet_v1_base Sequential (ref mobilenet_v1.py:52-190)
    -> load_mobilenet_state_dict -> flax head (Conv2d_0..11) + tail
    (Conv2d_12..13 + spatial mean, ref mobilenet_v1.py:226-234)."""
    tm = _randomize(ref_nets.mobilenet.mobilenet_v1_base(), seed=5)
    sd = tm.state_dict()

    head = MobileNetV1Head()
    tail = MobileNetV1Tail()
    x = np.random.RandomState(0).randn(1, 64, 96, 3).astype(np.float32)
    ph = head.init(jax.random.PRNGKey(0), jnp.asarray(x))
    pooled_shape = (2, 7, 7, 512)
    pt = tail.init(jax.random.PRNGKey(0), jnp.zeros(pooled_shape), True)
    merged = {"params": {"backbone": ph["params"], "tail": pt["params"]}}
    loaded, n = load_mobilenet_state_dict(merged, sd)
    assert n == 5 + 13 * 10, n

    feats = head.apply({"params": loaded["params"]["backbone"]}, jnp.asarray(x))
    with torch.no_grad():
        t_feat = nn.Sequential(*list(tm.children())[:12])(_nchw(x))
    _close(t_feat, feats, "mobilenet head vs reference module", atol=2e-4)

    pooled = np.random.RandomState(1).randn(*pooled_shape).astype(np.float32)
    fc7 = tail.apply({"params": loaded["params"]["tail"]}, jnp.asarray(pooled), True)
    with torch.no_grad():
        t7 = nn.Sequential(*list(tm.children())[12:])(_nchw(pooled))
        t7 = t7.mean(3).mean(2).numpy()
    np.testing.assert_allclose(np.asarray(fc7), t7, atol=2e-4)


def test_reference_bn_bypass_layer4(ref_nets):
    """The lidar tail runs layer4 with batchnorm_en=False (BN modules exist
    in the state_dict but forward bypasses them, ref resnet.py:103-119;
    lidarnet.py:38-52 builds the lidar resnets that way)."""
    ref_nets.cfg.USE_FPN = False
    tm = _randomize(
        ref_nets.resnet.resnet50(pretrained=False, batchnorm_en=False), seed=11
    )

    tail = ResNetLayer4(num_layers=50, batchnorm_en=False)
    v = tail.init(jax.random.PRNGKey(0), jnp.zeros((1, 7, 7, 1024)))
    params = {"params": {"backbone": {}, "tail": v["params"]}}
    loaded, n = load_resnet_state_dict(
        params, {k: v for k, v in tm.state_dict().items() if k.startswith("layer4")},
        use_fpn=False,
    )
    # conv kernels + the downsample BN (which the bypass does NOT skip,
    # ref resnet.py:193-197) map; block-body BN leaves have no destination
    assert n == 3 * 3 + 1 + 4, n  # 3 convs x 3 blocks + ds conv + ds bn(4)

    x = np.random.RandomState(4).uniform(-1, 1, (1, 7, 7, 1024)).astype(np.float32)
    with torch.no_grad():
        t = tm.layer4(_nchw(x))
    j = tail.apply({"params": loaded["params"]["tail"]}, jnp.asarray(x))
    _close(t, j, "bn-bypass layer4 vs reference module")
