"""Device-mesh parallelism (no reference counterpart — the reference is
single-GPU with gradient accumulation, SURVEY.md §2.17).

Data parallelism over the ICI mesh is the whole communication surface for
this model family: batch dim sharded, params replicated, psum on gradients
inserted by XLA from the sharding annotations.
"""

from faster_rcnn_pytorch_multimodal_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
