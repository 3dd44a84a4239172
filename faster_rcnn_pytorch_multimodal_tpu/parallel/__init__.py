"""Device-mesh parallelism (no reference counterpart — the reference is
single-GPU with gradient accumulation, SURVEY.md §2.17).

Data parallelism over the ICI mesh is the production communication surface
for this model family: batch dim sharded, params replicated, psum on
gradients inserted by XLA from the sharding annotations.  An optional
`model` axis adds tensor parallelism over the RoI-head channels and
spatial partitioning of the backbone (see mesh.py).
"""

from faster_rcnn_pytorch_multimodal_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    state_shardings,
)
