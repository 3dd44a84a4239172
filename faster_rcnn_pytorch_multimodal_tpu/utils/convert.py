"""PyTorch -> JAX parameter conversion.

The counterpart of the reference's tf->pytorch converters
(ref tools/convert_from_tensorflow*.py:30-68: key renames + HWCN/NCHW
transposes), going torch -> flax:

  conv weight (O, I, kH, kW)   -> kernel (kH, kW, I, O)
  linear weight (O, I)         -> kernel (I, O)
  bn weight/bias/running_mean/running_var -> scale/bias/mean/var

Covers torchvision-style ResNet state dicts (backbone init, PRELOAD=1,
ref imagenet.py:224-237 load_pretrained_cnn) and the reference's full
detector checkpoints (PRELOAD=2 keeps everything but the 2nd-stage
cls/bbox heads, ref imagenet.py:209-222 load_pretrained_full).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    try:
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def convert_tensor(key: str, value) -> np.ndarray:
    v = _t(value)
    if v.ndim == 4:  # conv OIHW -> HWIO
        return np.transpose(v, (2, 3, 1, 0))
    if v.ndim == 2:  # linear OI -> IO
        return np.transpose(v, (1, 0))
    return v


_BN_LEAF = {
    "weight": "scale",
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}


def resnet_key_to_flax(key: str, use_fpn: bool) -> Tuple[str, ...] | None:
    """torchvision resnet key -> our param path (under 'backbone' /
    C4-'tail').  Returns None for keys we drop (fc head, trackers)."""
    if "num_batches_tracked" in key or key.startswith("fc."):
        return None
    key = key.replace("resnet.", "")
    m = re.match(r"^(conv1|bn1)\.(\w+)$", key)
    if m:
        mod, leaf = m.groups()
        if mod == "conv1":
            return ("backbone", "stem", "conv1", "kernel")
        return ("backbone", "stem", "bn1", _BN_LEAF[leaf])
    m = re.match(r"^layer(\d)\.(\d+)\.(conv\d|bn\d|downsample)\.?(\d+)?\.(\w+)$", key)
    if not m:
        m2 = re.match(r"^layer(\d)\.(\d+)\.(conv\d|bn\d)\.(\w+)$", key)
        if not m2:
            return None
        stage, block, mod, leaf = m2.groups()
        ds_idx = None
    else:
        stage, block, mod, ds_idx, leaf = m.groups()
    stage_i, block_i = int(stage), int(block)
    # layer4 lives in the C4 tail (ref _head_to_tail); under FPN it's in
    # the pyramid backbone
    root = ("tail",) if (stage_i == 4 and not use_fpn) else ("backbone",)
    scope = root + (f"layer{stage_i}", f"block{block_i}")
    if mod == "downsample":
        name = "downsample_conv" if ds_idx == "0" else "downsample_bn"
        leaf_name = "kernel" if name == "downsample_conv" else _BN_LEAF[leaf]
        return scope + (name, leaf_name)
    if mod.startswith("conv"):
        return scope + (mod, "kernel")
    return scope + (mod, _BN_LEAF[leaf])


# torchvision vgg16 features indices of the 13 convs, in order
_VGG_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def vgg16_key_to_flax(key: str) -> Tuple[str, ...] | None:
    """torchvision vgg16 state-dict key -> our param path.

    features.<i> convs map to VGG16Head early_conv0..3 / late_conv4..12
    (ref lib/nets/vgg16.py:41-43 freezes the first 10 layers = conv1_1..
    conv2_2); classifier.0/.3 are fc6/fc7 in VGG16Tail.  classifier.6 (the
    1000-way imagenet head) is dropped like the reference does."""
    m = re.match(r"^features\.(\d+)\.(weight|bias)$", key)
    if m:
        idx, leaf = int(m.group(1)), m.group(2)
        if idx not in _VGG_CONV_IDX:
            return None
        conv_i = _VGG_CONV_IDX.index(idx)
        scope = "early" if conv_i < 4 else "late"
        return (
            "backbone",
            f"{scope}_conv{conv_i}",
            "kernel" if leaf == "weight" else "bias",
        )
    m = re.match(r"^classifier\.(0|3)\.(weight|bias)$", key)
    if m:
        fc = "fc6" if m.group(1) == "0" else "fc7"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("tail", fc, leaf)
    return None


def convert_vgg16_tensor(key: str, value) -> np.ndarray:
    """VGG16-aware tensor conversion: classifier.0 (fc6) flattens torch's
    (C=512, 7, 7) CHW RoI layout while our tail flattens HWC — the kernel
    rows must be permuted accordingly, not just transposed."""
    v = _t(value)
    if key == "classifier.0.weight":
        # (4096, 512*7*7) CHW-rows -> (7*7*512, 4096) HWC-rows
        return np.transpose(v.reshape(4096, 512, 7, 7), (2, 3, 1, 0)).reshape(
            7 * 7 * 512, 4096
        )
    return convert_tensor(key, v)


def mobilenet_key_to_flax(key: str) -> Tuple[str, ...] | None:
    """Reference torch mobilenet state-dict key -> our param path.

    The reference builds its net as Sequential end_points named Conv2d_0 /
    Conv2d_<i>.{depthwise,pointwise} with each a (conv, bn, relu) triple
    (ref lib/nets/mobilenet_v1.py:106-183; key renames from tf-slim in
    ref tools/convert_from_tensorflow_mobile.py:30-49).  Layers 0-11 live
    in our MobileNetV1Head ('backbone'), 12-13 in the tail
    (ref mobilenet_v1.py:267-270)."""
    if "num_batches_tracked" in key:
        return None
    # full-detector keys carry 'mobilenet.'; pretrained imagenet dumps use
    # 'features.' (ref mobilenet_v1.py:298-301 load_pretrained_cnn)
    key = key.replace("mobilenet.", "").replace("features.", "")
    m = re.match(r"^Conv2d_0\.(0|1)\.(\w+)$", key)
    if m:
        sub, leaf = m.groups()
        if sub == "0":
            return ("backbone", "conv0", "kernel")
        return ("backbone", "bn0", _BN_LEAF[leaf])
    m = re.match(r"^Conv2d_(\d+)\.(depthwise|pointwise)\.(0|1)\.(\w+)$", key)
    if not m:
        return None
    i, which, sub, leaf = int(m.group(1)), m.group(2), m.group(3), m.group(4)
    root = ("backbone",) if i <= 11 else ("tail",)
    scope = root + (f"layer{i}",)
    if sub == "0":
        return scope + (which, "kernel")
    return scope + (
        "dw_bn" if which == "depthwise" else "pw_bn",
        _BN_LEAF[leaf],
    )


def replicate_conv1_for_lidar(
    state_dict: Dict, num_slices: int, num_channel: int
) -> Dict:
    """Imagenet RGB conv1 -> BEV stem bootstrap (ref lib/nets/lidarnet.py:
    249-267 load_imagenet_pretrained_cnn): the R-channel kernel is
    replicated across the num_slices height slices and G/B fill the first
    two meta channels; any further meta channels start at zero."""
    out = dict(state_dict)
    w = _t(state_dict["conv1.weight"])  # (O, 3, kh, kw)
    new = np.zeros((w.shape[0], num_channel, w.shape[2], w.shape[3]), np.float32)
    new[:, :num_slices] = np.repeat(w[:, :1], num_slices, axis=1)
    if num_channel > num_slices:
        new[:, num_slices] = w[:, 1]
    if num_channel > num_slices + 1:
        new[:, num_slices + 1] = w[:, 2]
    out["conv1.weight"] = new
    return out


def _copy_state_dict(
    params: Dict, state_dict: Dict, key_fn, tensor_fn, verbose: bool = False
) -> Tuple[Dict, int]:
    """Copy torch tensors into a deep copy of the param tree; returns
    (new_params, n_loaded).  Keys with no mapping, absent paths, or shape
    mismatches are skipped (reported when verbose)."""
    import copy

    out = copy.deepcopy(params)
    root = out["params"] if "params" in out else out
    n = 0
    for key, value in state_dict.items():
        path = key_fn(key)
        if path is None:
            continue
        node = root
        ok = True
        for p in path[:-1]:
            if p not in node:
                ok = False
                break
            node = node[p]
        if not ok or path[-1] not in node:
            if verbose:
                print(f"skip {key} -> {'/'.join(path)} (absent)")
            continue
        v = tensor_fn(key, value)
        if tuple(node[path[-1]].shape) != tuple(v.shape):
            if verbose:
                print(f"skip {key}: shape {v.shape} vs {node[path[-1]].shape}")
            continue
        node[path[-1]] = v.astype(np.float32)
        n += 1
    return out, n


def load_vgg16_state_dict(
    params: Dict, state_dict: Dict, verbose: bool = False
) -> Tuple[Dict, int]:
    """Copy a torchvision vgg16 state_dict into our param tree."""
    return _copy_state_dict(
        params, state_dict, vgg16_key_to_flax, convert_vgg16_tensor, verbose
    )


def load_resnet_state_dict(
    params: Dict, state_dict: Dict, use_fpn: bool = False, verbose: bool = False
) -> Tuple[Dict, int]:
    """Copy a torchvision resnet state_dict into our param tree."""
    return _copy_state_dict(
        params,
        state_dict,
        lambda k: resnet_key_to_flax(k, use_fpn),
        convert_tensor,
        verbose,
    )


def load_mobilenet_state_dict(
    params: Dict, state_dict: Dict, verbose: bool = False
) -> Tuple[Dict, int]:
    """Copy a reference-layout mobilenet state_dict into our param tree.
    Depthwise torch kernels are (C, 1, kh, kw); the OIHW->HWIO transpose
    lands them at (kh, kw, 1, C), exactly flax's feature_group_count=C
    layout — no special casing needed."""
    return _copy_state_dict(
        params, state_dict, mobilenet_key_to_flax, convert_tensor, verbose
    )


def reconcile_bn_stats(template: Dict, loaded: Dict, verbose: bool = True) -> Dict:
    """Merge a restored variables dict into `template`'s structure, mapping
    BN running statistics across storage collections.

    torch keeps BN running_mean/running_var in the state dict regardless of
    train/eval mode (ref lib/utils/init_utils.py:56-77 set_bn_fix only stops
    gradients), so a checkpoint trained at any FIXED_BLOCKS loads into a
    model built at any other.  Here frozen-BN models store mean/var under
    ("params", ..., "mean"/"var") while live-BN models (fixed_blocks == -1)
    keep them in the "batch_stats" collection — this maps either layout into
    whichever the target model expects, so e.g. test_net without
    --fixed_blocks -1 still evaluates a from-scratch live-BN checkpoint
    correctly (and a converted frozen checkpoint preloads into a live
    model).  Leaves absent from `loaded` keep their template (init) values;
    a count of such fallbacks is printed so partial loads are never silent.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    t = flatten_dict(dict(template))
    l = flatten_dict(dict(loaded))
    out = {}
    missing = []
    for k, v in t.items():
        cand = l.get(k)
        if cand is None and k and k[-1] in ("mean", "var"):
            if k[0] == "params":
                cand = l.get(("batch_stats",) + k[1:])
            elif k[0] == "batch_stats":
                cand = l.get(("params",) + k[1:])
        if cand is not None and np.shape(cand) == np.shape(v):
            out[k] = cand
        else:
            out[k] = v
            missing.append(k)
    if verbose and missing:
        print(
            f"reconcile_bn_stats: {len(missing)} / {len(t)} leaves kept "
            f"init values (first: {'/'.join(missing[0])})"
        )
    return unflatten_dict(out)


def restore_reconciled(path: str, template_vars: Dict, verbose: bool = True) -> Dict:
    """Orbax raw restore of a solver snapshot + BN-stat reconciliation.

    Shared by solver.load_pretrained, tools/test_net.py and tools/demo.py:
    restores WITHOUT a template so collections the consuming model does not
    expect (e.g. batch_stats from a live-BN training run) are still read,
    then maps them into `template_vars`' layout via reconcile_bn_stats."""
    import os

    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        raw = ckptr.restore(os.path.abspath(path))
    return reconcile_bn_stats(template_vars, raw["state"]["params"], verbose=verbose)


# ---------------------------------------------------------------------------
# tf-faster-rcnn (tf-slim) checkpoint import
# ---------------------------------------------------------------------------

def _ordered_replace(var_dict: Dict, replacements) -> Dict:
    """Apply the reference's ordered in-place key rewrites
    (ref tools/convert_from_tensorflow*.py dummy_replace loops)."""
    for a, b in replacements:
        for k in list(var_dict.keys()):
            if a in k:
                var_dict[k.replace(a, b)] = var_dict.pop(k)
    return var_dict


def _strip_prefix(var_dict: Dict, stem: str) -> Dict:
    out = {}
    for k, v in var_dict.items():
        if k == "Variable" or "Momentum" in k:
            continue  # global step + optimizer slots (ref :19-24)
        out[stem + k[k.find("/"):] if "/" in k else k] = np.asarray(v)
    return out


def _torch_layout(var_dict: Dict, depthwise_hint: bool = False) -> Dict:
    """tf HWIO conv / IO fc -> torch OIHW / OI (ref :64-69).  tf depthwise
    kernels are HWC1 and become torch groups-conv (C,1,H,W) via (2,3,0,1)
    (ref convert_from_tensorflow_mobile.py:61-66)."""
    for k in list(var_dict.keys()):
        v = var_dict[k]
        if v.ndim == 4:
            perm = (2, 3, 0, 1) if depthwise_hint and "depthwise" in k else (3, 2, 0, 1)
            var_dict[k] = np.ascontiguousarray(v.transpose(perm))
        elif v.ndim == 2:
            var_dict[k] = np.ascontiguousarray(v.T)
    return var_dict


def tf_slim_resnet_to_torch(var_dict: Dict) -> Dict:
    """tf-faster-rcnn resnet checkpoint tensors -> the reference's torch
    key space ('resnet.layerN...' + head names), numpy values in torch
    layout (ref tools/convert_from_tensorflow.py:26-75).  Feed the result
    to load_resnet_state_dict (resnet_key_to_flax strips 'resnet.')."""
    import re

    var_dict = _strip_prefix(dict(var_dict), "resnet")
    _ordered_replace(var_dict, [
        ("moving_mean", "running_mean"),
        ("moving_variance", "running_var"),
        ("weights", "weight"),
        ("biases", "bias"),
        ("conv1/BatchNorm", "bn1"),
        ("conv2/BatchNorm", "bn2"),
        ("conv3/BatchNorm", "bn3"),
        ("bottleneck_v1/", ""),
        ("block", "layer"),
        ("resnet/rpn_conv/3x3", "rpn_net"),
        ("resnet/rpn_cls_score", "rpn_cls_score_net"),
        ("resnet/cls_score", "cls_score_net"),
        ("resnet/rpn_bbox_pred", "rpn_bbox_pred_net"),
        ("resnet/bbox_pred", "bbox_pred_net"),
        ("shortcut/weight", "downsample.0.weight"),
        ("shortcut/BatchNorm", "downsample.1"),
        ("gamma", "weight"),
        ("beta", "bias"),
        ("/", "."),
    ])
    # unit_N -> N-1 block index (ref :58-62)
    for k in list(var_dict.keys()):
        m = re.search(r"unit_(\d+)", k)
        if m:
            var_dict[k.replace(m.group(0), str(int(m.group(1)) - 1))] = (
                var_dict.pop(k)
            )
    return _torch_layout(var_dict)


def tf_slim_vgg_to_torch(var_dict: Dict) -> Dict:
    """ref tools/convert_from_tensorflow_vgg.py:20-75; fc6 carries the
    7x7x512 spatial reshape quirk (tf flattens HWC, torch CHW)."""
    var_dict = _strip_prefix(dict(var_dict), "vgg")
    _ordered_replace(var_dict, [
        ("weights", "weight"),
        ("biases", "bias"),
        ("vgg/rpn_conv/3x3", "rpn_net"),
        ("vgg/rpn_cls_score", "rpn_cls_score_net"),
        ("vgg/cls_score", "cls_score_net"),
        ("vgg/rpn_bbox_pred", "rpn_bbox_pred_net"),
        ("vgg/bbox_pred", "bbox_pred_net"),
        ("/", "."),
    ])
    _ordered_replace(var_dict, [
        ("conv1.conv1_1", "features.0"), ("conv1.conv1_2", "features.2"),
        ("conv2.conv2_1", "features.5"), ("conv2.conv2_2", "features.7"),
        ("conv3.conv3_1", "features.10"), ("conv3.conv3_2", "features.12"),
        ("conv3.conv3_3", "features.14"), ("conv4.conv4_1", "features.17"),
        ("conv4.conv4_2", "features.19"), ("conv4.conv4_3", "features.21"),
        ("conv5.conv5_1", "features.24"), ("conv5.conv5_2", "features.26"),
        ("conv5.conv5_3", "features.28"),
        ("fc6", "classifier.0"), ("fc7", "classifier.3"),
    ])
    for k in list(var_dict.keys()):
        v = var_dict[k]
        if "classifier.0" in k and v.ndim == 2:
            # (25088, 4096) tf HWC-flat -> torch CHW-flat (ref :70-72)
            var_dict[k] = np.ascontiguousarray(
                v.reshape(7, 7, 512, 4096).transpose(3, 2, 0, 1).reshape(4096, -1)
            )
        elif v.ndim == 4:
            var_dict[k] = np.ascontiguousarray(v.transpose(3, 2, 0, 1))
        elif v.ndim == 2:
            var_dict[k] = np.ascontiguousarray(v.T)
    return var_dict


def tf_slim_mobilenet_to_torch(var_dict: Dict) -> Dict:
    """ref tools/convert_from_tensorflow_mobile.py:25-70."""
    var_dict = _strip_prefix(dict(var_dict), "mobilenet")
    _ordered_replace(var_dict, [
        ("moving_mean", "running_mean"),
        ("moving_variance", "running_var"),
        ("weights", "weight"),
        ("biases", "bias"),
        ("/BatchNorm", ".1"),
        ("_pointwise/", ".pointwise.0."),
        ("_depthwise/depthwise_", ".depthwise.0."),
        ("_pointwise.1", ".pointwise.1"),
        ("_depthwise.1", ".depthwise.1"),
        ("Conv2d_0/", "Conv2d_0.0."),
        ("mobilenet/rpn_conv/3x3", "rpn_net"),
        ("mobilenet/rpn_cls_score", "rpn_cls_score_net"),
        ("mobilenet/cls_score", "cls_score_net"),
        ("mobilenet/rpn_bbox_pred", "rpn_bbox_pred_net"),
        ("mobilenet/bbox_pred", "bbox_pred_net"),
        ("gamma", "weight"),
        ("beta", "bias"),
        ("/", "."),
    ])
    return _torch_layout(var_dict, depthwise_hint=True)
