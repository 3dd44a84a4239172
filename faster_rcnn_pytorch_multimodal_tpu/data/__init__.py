"""Data pipeline: dataset builders (roidb), host loader with prefetch,
augmentation, and the synthetic smoke-test dataset.

Re-design of ref lib/roi_data_layer/ + lib/model/data_layer_generator.py:
the background multiprocessing.Process + Queue becomes a thread-prefetched
iterator producing PADDED, batch-stacked numpy arrays (static shapes for
XLA); LiDAR frames ship raw points — voxelization happens on device
(ops.voxelize).
"""

from faster_rcnn_pytorch_multimodal_tpu.data.loader import BatchLoader  # noqa: F401
from faster_rcnn_pytorch_multimodal_tpu.data.synthetic import SyntheticDataset  # noqa: F401
