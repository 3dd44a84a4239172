"""TPU-native multimodal (image + LiDAR BEV) Faster R-CNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mathild7/faster_rcnn_pytorch_multimodal (reference layout documented in
/root/repo/SURVEY.md): two-stage Faster R-CNN with optional FPN for 2D image
and 3D LiDAR BEV detection, with aleatoric + epistemic uncertainty estimation.

Design stance (not a port):
  * frozen dataclass config tree instead of a global mutable EasyDict
    (reference: lib/model/config.py)
  * pure-functional model (flax modules, explicit PRNG), one jitted
    train step over REAL batches (reference pseudo-batching:
    lib/model/train_val.py:379-382 is replaced by hardware batching)
  * static shapes everywhere: padded GT boxes, fixed top-k proposal path,
    fixed-size XLA NMS, fixed 256-RoI second stage
  * data-parallel pjit/shard_map over a jax.sharding.Mesh
  * on-device BEV voxelization (reference: spconv on host,
    lib/roi_data_layer/minibatch.py:445-510)
"""

__version__ = "0.1.0"

from faster_rcnn_pytorch_multimodal_tpu.config import Config, default_config  # noqa: F401
