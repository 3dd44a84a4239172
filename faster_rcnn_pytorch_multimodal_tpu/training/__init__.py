"""Training: optimizer param groups, jitted train step, solver loop,
checkpointing (re-design of ref lib/model/train_val.py)."""

from faster_rcnn_pytorch_multimodal_tpu.training.optim import (  # noqa: F401
    build_optimizer,
    lr_schedule,
)
from faster_rcnn_pytorch_multimodal_tpu.training.solver import (  # noqa: F401
    Solver,
    make_train_step,
)
