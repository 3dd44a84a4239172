"""Detection ops: the TPU-native re-design of the reference's
lib/layer_utils/ + lib/model/bbox_transform.py + lib/utils/bbox.py layer.

Everything here is either a host-side static precomputation (anchor grids)
or a pure jittable jnp function with static shapes (transforms, IoU, NMS,
targets, RoI align, voxelization).
"""

from faster_rcnn_pytorch_multimodal_tpu.ops.anchors import (  # noqa: F401
    generate_anchors,
    generate_anchors_pre,
    generate_3d_anchors,
)
from faster_rcnn_pytorch_multimodal_tpu.ops.box_transform import (  # noqa: F401
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    lidar_3d_bbox_transform,
    lidar_3d_bbox_transform_inv,
    uncertainty_transform_inv,
    lidar_3d_uncertainty_transform_inv,
)
from faster_rcnn_pytorch_multimodal_tpu.ops.iou import bbox_overlaps  # noqa: F401
from faster_rcnn_pytorch_multimodal_tpu.ops.nms import nms  # noqa: F401
