"""RoI Align as a Pallas TPU kernel.

The einsum formulation (ops/roi_align.py) is HBM-traffic-bound: its first
contraction materializes an (R, S, dim, C) intermediate (~hundreds of MB
per frame at detection sizes) that is written to and re-read from HBM.
This kernel keeps the whole pipeline in VMEM: per grid cell it loads one
(H, W, C_blk) feature block, contracts the per-RoI interpolation matrices
against it on the MXU, and writes only the pooled (R_blk, P, P, C_blk)
output — the intermediate never leaves the chip.

Mosaic constraints shaping the design (probed on v5e):
  * dot_general supports 2-D x 2-D and batched (leading batch dim) forms,
    NOT a free 3-D rhs — so the H contraction is a flat 2-D dot over
    (H, W*C) and the W contraction a batched dot over rois;
  * block lane (last) dims are 128-multiples: C_blk = 128, and the
    backward's dF block is emitted (H, C, W) with W padded to 128;
  * sublane dims are 16-multiples for bf16: W is padded to 16 in forward;
  * the feature block's index map ignores the innermost (roi) grid dim so
    it is fetched once per (batch, c_blk) and revisited;
  * the backward accumulates dF in the revisited output block and flushes
    when the block index changes (init at roi-block 0).

Gradients flow to `features` only — torchvision's roi_align backward
ignores the rois (ref lib/utils/torchpoolers.py pools through
torchvision.ops.roi_align), so the caller stop-gradients rois for parity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from faster_rcnn_pytorch_multimodal_tpu.ops.roi_align import (
    _hat_weights,
    _sample_coords,
)

# Block sizes trade per-cell grid overhead (dominant when cells are small:
# R_BLK=8/C_BLK=128 left the kernel launch-bound at 2048 cells for C4)
# against VMEM (the f32 dot-1 result + bf16 intermediate must fit 128 MB
# alongside the XLA windows: R_BLK=64/C_BLK=128 overflowed by 4 MB)
C_BLK = 256
R_BLK = 32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(wy_ref, wx_ref, f_ref, out_ref, *, p: int, sr: int):
    """One (b, c_blk, r_blk) cell: pool R_BLK rois from the feature block."""
    s = p * sr
    h, w = f_ref.shape[1], f_ref.shape[2]
    f2 = f_ref[0].reshape(h, w * C_BLK)
    wy = wy_ref[0].reshape(R_BLK * s, h)
    # contract H (2-D MXU dot): tmp[(r y), (w c)] = wy @ F.  Mosaic requires
    # a 32-bit matmul accumulator; cast the result down to bf16 so the VMEM
    # intermediate matches the einsum path's dtype
    tmp = (
        jax.lax.dot_general(
            wy,
            f2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        .astype(f2.dtype)
        .reshape(R_BLK, s, w, C_BLK)
    )
    # contract W (batched over rois): out[r, x, y, c]
    out = jax.lax.dot_general(
        wx_ref[0],  # (R, S_x, W)
        tmp,  # (R, S_y, W, C)
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (R, S_x, S_y, C)
    out = out.reshape(R_BLK, p, sr, p, sr, C_BLK).mean(axis=(2, 4))
    out_ref[0] = jnp.swapaxes(out, 1, 2).astype(out_ref.dtype)  # (R, p_y, p_x, C)


def _bwd_kernel(wy_ref, wx_ref, g_ref, df_ref, *, p: int, sr: int):
    """Accumulate dF for one roi block; the df block is revisited across
    the innermost (roi) grid dim and flushed when (b, c_blk) changes."""
    s = p * sr
    h, w = wy_ref.shape[3], wx_ref.shape[3]
    r_idx = pl.program_id(2)

    @pl.when(r_idx == 0)
    def _():
        df_ref[0] = jnp.zeros_like(df_ref[0])

    # pooled grad -> sample-grid grad (mean over sr x sr)
    g = g_ref[0].astype(jnp.float32) / float(sr * sr)  # (R, P, P, C)
    g = jnp.broadcast_to(
        g[:, :, None, :, None, :], (R_BLK, p, sr, p, sr, C_BLK)
    ).reshape(R_BLK, s, s, C_BLK)  # (R, S_y, S_x, C)
    wx = wx_ref[0].astype(jnp.float32)  # (R, S_x, W)
    # A[r, y, c, w] = sum_x g[r, y, x, c] wx[r, x, w]  (batched over rois)
    a = jax.lax.dot_general(
        g,
        wx,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (R, S_y, C, W)
    # dF[h, (c w)] += sum_{(r y)} wy[(r y), h] A[(r y), (c w)]
    wy2 = wy_ref[0].astype(jnp.float32).reshape(R_BLK * s, h)
    a2 = a.reshape(R_BLK * s, C_BLK * w)
    df = jax.lax.dot_general(
        wy2,
        a2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, C*W)
    df_ref[0] += df.reshape(h, C_BLK, w).astype(df_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("h", "w", "output_size", "sampling_ratio", "aligned"),
)
def _weights(rois, h, w, spatial_scale, output_size, sampling_ratio, aligned):
    gy, gx = jax.vmap(
        lambda r: _sample_coords(r, spatial_scale, output_size, sampling_ratio, aligned)
    )(rois)
    wy = jax.vmap(lambda c: _hat_weights(c, h))(gy)  # (B, R, S, H)
    wx = jax.vmap(lambda c: _hat_weights(c, w))(gx)  # (B, R, S, W)
    return wy, wx


def _pad_axis(x: jnp.ndarray, axis: int, target: int) -> jnp.ndarray:
    if x.shape[axis] == target:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, pads)


def _fwd_impl(features, wy, wx, output_size, sampling_ratio, interpret=False):
    b, h, w, c = features.shape
    r = wy.shape[1]
    p, sr = output_size, sampling_ratio
    s = p * sr
    w_pad = _round_up(w, 16)
    c_pad = _round_up(c, C_BLK)
    r_pad = _round_up(r, R_BLK)
    f = _pad_axis(_pad_axis(features, 2, w_pad), 3, c_pad)
    wy = _pad_axis(wy, 1, r_pad)
    wx = _pad_axis(_pad_axis(wx, 1, r_pad), 3, w_pad)

    grid = (b, c_pad // C_BLK, r_pad // R_BLK)
    out = pl.pallas_call(
        partial(_fwd_kernel, p=p, sr=sr),
        out_shape=jax.ShapeDtypeStruct((b, r_pad, p, p, c_pad), features.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, R_BLK, s, h),
                lambda bi, ci, ri: (bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, R_BLK, s, w_pad),
                lambda bi, ci, ri: (bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h, w_pad, C_BLK),
                lambda bi, ci, ri: (bi, 0, 0, ci),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, R_BLK, p, p, C_BLK),
            lambda bi, ci, ri: (bi, ri, 0, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        wy.astype(features.dtype),
        wx.astype(features.dtype),
        f,
    )
    return out[:, :r, :, :, :c]


def _bwd_impl(g, wy, wx, shape, dtype, output_size, sampling_ratio, interpret=False):
    b, h, w, c = shape
    r = wy.shape[1]
    p, sr = output_size, sampling_ratio
    s = p * sr
    # dF is emitted (H, C, W): its lane dim is W, so pad W to 128 here
    w_pad = _round_up(w, 128)
    c_pad = _round_up(c, C_BLK)
    r_pad = _round_up(r, R_BLK)
    wy = _pad_axis(wy, 1, r_pad)
    wx = _pad_axis(_pad_axis(wx, 1, r_pad), 3, w_pad)
    g = _pad_axis(_pad_axis(g, 1, r_pad), 4, c_pad)

    grid = (b, c_pad // C_BLK, r_pad // R_BLK)
    df_t = pl.pallas_call(
        partial(_bwd_kernel, p=p, sr=sr),
        out_shape=jax.ShapeDtypeStruct((b, h, c_pad, w_pad), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, R_BLK, s, h),
                lambda bi, ci, ri: (bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, R_BLK, s, w_pad),
                lambda bi, ci, ri: (bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, R_BLK, p, p, C_BLK),
                lambda bi, ci, ri: (bi, ri, 0, 0, ci),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, C_BLK, w_pad),
            lambda bi, ci, ri: (bi, 0, ci, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        wy.astype(dtype),
        wx.astype(dtype),
        g,
    )
    # (B, H, C, W) -> (B, H, W, C), crop padding
    return jnp.transpose(df_t, (0, 1, 3, 2))[:, :, :w, :c]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def roi_align_batched_pallas(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched RoI align: features (B, H, W, C), rois (B, R, 4) ->
    (B, R, P, P, C).  Gradient w.r.t. features only (torchvision parity)."""
    _, h, w, _ = features.shape
    wy, wx = _weights(rois, h, w, spatial_scale, output_size, sampling_ratio, aligned)
    return _fwd_impl(features, wy, wx, output_size, sampling_ratio, interpret)


def _vjp_fwd(features, rois, spatial_scale, output_size, sampling_ratio, aligned, interpret):
    _, h, w, _ = features.shape
    wy, wx = _weights(rois, h, w, spatial_scale, output_size, sampling_ratio, aligned)
    out = _fwd_impl(features, wy, wx, output_size, sampling_ratio, interpret)
    return out, (wy, wx)


def _vjp_bwd(spatial_scale, output_size, sampling_ratio, aligned, interpret, res, g):
    wy, wx = res
    # feature shape/dtype recovered from the residual weights + out-grad:
    # wy is (B, R, S, H) unpadded, wx (B, R, S, W), g (B, R, P, P, C)
    shape = (g.shape[0], wy.shape[3], wx.shape[3], g.shape[4])
    df = _bwd_impl(g, wy, wx, shape, g.dtype, output_size, sampling_ratio, interpret)
    return df, jnp.zeros((shape[0], wy.shape[1], 4), jnp.float32)


roi_align_batched_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_available() -> bool:
    """Whether to dispatch RoI align to this kernel by default.

    Measured on v5e (b8 res101, post contraction-order fix in the einsum
    path): the einsum formulation wins end-to-end — C4 image train 52.4
    f/s (einsum) vs 37.1 (pallas R_BLK=32/C_BLK=128) vs 38.0 (R_BLK=32/
    C_BLK=256).  Doubling the cell size bought <1 f/s, so the gap is
    structural, not launch overhead: the M=14 batched second dot
    under-utilizes the MXU and the f32 dot-1 result materializes in VMEM
    before the bf16 cast.  The kernel is therefore OPT-IN
    (FRCNN_PALLAS_ROI_ALIGN=1) until its tiling beats XLA; it is
    numerically validated against the einsum path in
    tests/test_roi_align_pallas.py either way."""
    import os

    if os.environ.get("FRCNN_PALLAS_ROI_ALIGN", "0") != "1":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
