"""ctypes bindings for the native host-side point-cloud ops (native/pc_ops.cpp).

Builds the shared library on first use (g++ available in the image) and
falls back to the pure-numpy implementations in data.augment when the
toolchain is missing, so the framework stays importable anywhere.
"""

from faster_rcnn_pytorch_multimodal_tpu.native.pc_ops import (  # noqa: F401
    available,
    pc_dropout,
    pc_flip_x,
    pc_flip_y,
    pc_gauss_distort,
    pc_rain_sim,
    pc_range_filter,
    pc_rotate_z,
    pc_swap_xy,
)
