"""Model zoo: backbones (ResNet-34/50/101/152, VGG16, MobileNetV1), FPN,
and the two-stage Faster R-CNN detector with uncertainty heads.

Re-designs the reference's lib/nets/ (imagenet.py, lidarnet.py, resnet.py,
fpn.py, vgg16.py, mobilenet_v1.py + the absent network.py, reconstructed in
SURVEY.md §2.1) as flax modules + pure composition functions.
"""

from faster_rcnn_pytorch_multimodal_tpu.models.detector import (  # noqa: F401
    FasterRCNN,
    TrainState,
)
