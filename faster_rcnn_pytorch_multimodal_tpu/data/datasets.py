"""Dataset registry (ref lib/datasets/factory.py:20-45).

Real dataset loaders (waymo/kitti/cadc/nuscenes) register here as they are
implemented; unknown names fail with the list of valid choices.
"""

from __future__ import annotations

from faster_rcnn_pytorch_multimodal_tpu.config import Config

_REGISTRY = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_db(db_name: str, cfg: Config, mode: str):
    key = db_name.split("_")[0]
    if key not in _REGISTRY:
        raise KeyError(
            f"unknown dataset {db_name!r}; available: "
            f"{sorted(_REGISTRY) + ['synthetic']}"
        )
    return _REGISTRY[key](db_name, cfg, mode)


# populated lazily to avoid import cycles
def _autoload():
    from faster_rcnn_pytorch_multimodal_tpu.data import waymo  # noqa: F401
    from faster_rcnn_pytorch_multimodal_tpu.data import kitti  # noqa: F401
    from faster_rcnn_pytorch_multimodal_tpu.data import cadc  # noqa: F401
    from faster_rcnn_pytorch_multimodal_tpu.data import nuscenes  # noqa: F401
    from faster_rcnn_pytorch_multimodal_tpu.data import pascal_voc  # noqa: F401
    from faster_rcnn_pytorch_multimodal_tpu.data import coco  # noqa: F401


try:
    _autoload()
except ImportError:
    pass
