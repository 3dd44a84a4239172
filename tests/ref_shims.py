"""Import shims for the reference's python modules (read-only tree).

Shared by the reference-parity suites: installs the minimal stand-ins for
dependencies absent from this image so `/root/reference/lib` modules import
unmodified:

  * `easydict` — attribute-dict (only get/set used by ref model/config.py),
  * `np.float` — removed in numpy 2.x, used by the numpy
    anchor_target_layer variant (ref anchor_target_layer.py:209-219),
  * `torchvision.ops.nms` — replaced by an exact greedy torch oracle with
    torchvision's semantics (score-descending, suppress IoU > thresh,
    areas WITHOUT the legacy +1) so ref proposal_layer.py:46 and
    filter_predictions.py:67-69 run as shipped,
  * `nets.network` — the reference repo does not ship network.py.

The shims add behavior only at the import boundary; every line of detection
math under test is the reference's own.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

REF_LIB = "/root/reference/lib"


class EasyDict(dict):
    """Just enough of easydict for the reference config module."""

    def __init__(self, d=None, **kw):
        super().__init__()
        for k, v in dict(d or {}, **kw).items():
            setattr(self, k, v)

    def __setattr__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            v = EasyDict(v)
        super().__setattr__(k, v)
        super().__setitem__(k, v)

    __setitem__ = __setattr__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def torchvision_nms(boxes: torch.Tensor, scores: torch.Tensor,
                    iou_threshold: float) -> torch.Tensor:
    """Exact greedy NMS with torchvision.ops.nms semantics (oracle)."""
    order = torch.argsort(scores, descending=True)
    b = boxes[order]
    n = b.shape[0]
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    suppressed = torch.zeros(n, dtype=torch.bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(order[i].item())
        xx1 = torch.maximum(b[i, 0], b[i + 1:, 0])
        yy1 = torch.maximum(b[i, 1], b[i + 1:, 1])
        xx2 = torch.minimum(b[i, 2], b[i + 1:, 2])
        yy2 = torch.minimum(b[i, 3], b[i + 1:, 3])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        union = areas[i] + areas[i + 1:] - inter
        iou = torch.where(union > 0, inter / union, torch.zeros_like(inter))
        suppressed[i + 1:] |= iou > iou_threshold
    return torch.tensor(keep, dtype=torch.long)


def install_ref_shims() -> None:
    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")
        m.EasyDict = EasyDict
        sys.modules["easydict"] = m
    if not hasattr(np, "float"):
        np.float = float  # numpy 2.x removal; ref uses np.float dtype args
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.nms = torchvision_nms
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    if REF_LIB not in sys.path:
        sys.path.append(REF_LIB)
    if "nets.network" not in sys.modules:
        try:
            import nets  # noqa: F401  (reference package)

            stub = types.ModuleType("nets.network")

            class Network:  # pragma: no cover - never instantiated
                pass

            stub.Network = Network
            sys.modules["nets.network"] = stub
        except ImportError:  # reference tree absent: caller skips
            pass


def import_ref_detection_math():
    """Import the reference's detection-math modules; returns a namespace."""
    install_ref_shims()
    import layer_utils.anchor_target_layer as ref_anchor_target
    import layer_utils.proposal_layer as ref_proposal
    import layer_utils.proposal_target_layer as ref_proposal_target
    import model.bbox_transform as ref_bbox_transform
    import utils.bbox as ref_bbox
    import utils.filter_predictions as ref_filter
    import utils.loss_utils as ref_loss
    from model.config import cfg as ref_cfg

    return types.SimpleNamespace(
        anchor_target=ref_anchor_target,
        proposal=ref_proposal,
        proposal_target=ref_proposal_target,
        bbox_transform=ref_bbox_transform,
        bbox=ref_bbox,
        filter=ref_filter,
        loss=ref_loss,
        cfg=ref_cfg,
    )
