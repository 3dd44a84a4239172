"""ResNet backbone (flax) with the reference's detection-specific surgery.

Mirrors the torchvision-fork in ref lib/nets/resnet.py:
  * Bottleneck with optional per-block dropout (plain after relu1/relu3,
    channelwise "2d" after relu2) and a batchnorm bypass flag (:74-128),
  * caffe-style stride moves: layers 2-3 put the stride on the 1x1 conv1
    instead of the 3x3 conv2 (ResNetWrapper, :227-234),
  * stride-1 layer4 when no FPN (:235-238).

BatchNorm is implemented as FrozenBatchNorm (affine transform with stored
running stats).  The reference freezes BN for every FIXED_BLOCKS setting
except -1 (ref imagenet.py:96-163: set_bn_fix + eval-mode BN), so frozen BN
is the production behavior; it also removes cross-device batch statistics
from the TPU data-parallel path entirely.  With FIXED_BLOCKS == -1 the
reference instead runs BN in TRAIN mode (set_bn_var + set_bn_train,
imagenet.py:110-111, 157-158): live batch statistics + trainable affine.
`live_bn=True` reproduces that: normalization uses the current batch's
mean/var (running averages, kept in the `batch_stats` collection, are
momentum-updated for eval).  This is the from-scratch enabler — without
live stats the sparse-BEV activations stay at ~0.02 std and RPN logit
gradients are too small to separate fg from bg (tools/diag_bev_overfit.py).
Under jit over a sharded batch, jnp.mean reduces over the GLOBAL batch
(XLA inserts the collective), so data-parallel training gets synchronized
BN for free — stronger than torch's per-device statistics.

`zero_init_residual` (residual-terminator BN scale initialized to zero, the
torchvision trick that keeps from-scratch deep-resnet activations bounded)
is only enabled when that affine pair is TRAINABLE, i.e. fixed_blocks == -1:
with fixed_blocks >= 0 the optimizer freezes every BN parameter, and a
frozen zero scale would permanently kill every residual branch (the model
silently degenerates to stem+downsample paths).  fixed_blocks >= 0 assumes
pretrained weights overwrite the init (the solver warns otherwise).

Layout: NHWC everywhere (TPU-native).  bfloat16 activations are applied at
the detector level; params stay float32.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# layers-per-stage per depth (ref resnet.py:242-295)
STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
BASIC_DEPTHS = (18, 34)


class FrozenBatchNorm(nn.Module):
    """BN as a fixed affine map: y = (x - mean) * rsqrt(var + eps) * scale + bias.

    Parameters are stored under the same names a converted torch checkpoint
    provides (scale/bias/mean/var); the optimizer masks them out.

    With `live=True` (fixed_blocks == -1, ref imagenet.py:110-111 set_bn_var
    + set_bn_train) this becomes torch-train-mode BN: `use_batch_stats=True`
    normalizes with the CURRENT batch's statistics (gradients flow through
    them) and momentum-updates running averages stored in the `batch_stats`
    collection; `use_batch_stats=False` (eval) normalizes with the running
    averages.  Checkpoint converters target the frozen layout — preloading
    into a live-BN model needs the stats mapped into `batch_stats` instead
    of `params` (from-scratch training, the live use case, never preloads).
    """

    features: int
    eps: float = 1e-5
    zero_scale: bool = False  # zero-init (residual-branch terminator)
    live: bool = False
    momentum: float = 0.1  # torch nn.BatchNorm2d default

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, use_batch_stats: bool = False
    ) -> jnp.ndarray:
        scale_init = (
            nn.initializers.zeros if self.zero_scale else nn.initializers.ones
        )
        scale = self.param("scale", scale_init, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if not self.live:
            mean = self.param("mean", nn.initializers.zeros, (self.features,))
            var = self.param("var", nn.initializers.ones, (self.features,))
        else:
            ra_mean = self.variable(
                "batch_stats", "mean", jnp.zeros, (self.features,)
            )
            ra_var = self.variable(
                "batch_stats", "var", jnp.ones, (self.features,)
            )
            if use_batch_stats and not self.is_initializing():
                xf = x.astype(jnp.float32).reshape(-1, self.features)
                mean = jnp.mean(xf, axis=0)
                var = jnp.var(xf, axis=0)
                if self.is_mutable_collection("batch_stats"):
                    n = xf.shape[0]
                    unbiased = var * (n / max(n - 1, 1))
                    m = self.momentum
                    ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                    ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
            else:
                mean, var = ra_mean.value, ra_var.value
        # per-channel affine computed in f32 (C elements, cheap), applied in
        # x.dtype: upcasting the ACTIVATION tensor to f32 here makes XLA
        # store the preceding conv's output as f32 — at MC-dropout inference
        # sizes that is a 9 GB buffer and 2x the HBM traffic of bf16
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps)
        a = inv * scale.astype(jnp.float32)
        b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * a
        return x * a.astype(x.dtype) + b.astype(x.dtype)


class CheapDropout(nn.Module):
    """Dropout with a u8 mask drawn from 4x fewer hardware random words.

    flax's nn.Dropout draws one u32 per element (bernoulli -> uniform);
    the RngBitGenerator output is unfusible, so at MC-dropout inference
    the mask bits alone are GBs of HBM per step (u32[10,2400,7,7,2048] =
    9 GB observed).  One random BYTE per element is ample for a dropout
    mask: the keep probability quantizes to 1/256 and the scale uses the
    QUANTIZED value, so E[output] == input holds exactly.  jax lowers
    uint8 `random.bits` on the rbg impl straight to a u8-output
    RngBitGenerator — 4x less generator output; the compare+select fuses
    into the consumer.

    API mirrors nn.Dropout (rate, broadcast_dims, deterministic).
    """

    rate: float
    broadcast_dims: Sequence[int] = ()

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        if self.rate >= 1.0:
            return jnp.zeros_like(x)
        shape = list(x.shape)
        for d in self.broadcast_dims:
            shape[d] = 1
        u8 = jax.random.bits(self.make_rng("dropout"), tuple(shape), jnp.uint8)
        keep_q = max(1, round((1.0 - self.rate) * 256.0))  # P(keep) = keep_q/256
        # compare in u16: keep_q can be 256 (rate < 1/512), which wraps in u8
        mask = u8.astype(jnp.uint16) < jnp.uint16(keep_q)
        scale = jnp.asarray(256.0 / keep_q, x.dtype)
        return jnp.where(mask, x * scale, jnp.zeros_like(x))


def _conv(features: int, kernel: int, stride: int = 1, name: str | None = None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        name=name,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
    )


class Bottleneck(nn.Module):
    """ref resnet.py:74-128 (+ wrapper stride surgery :227-238)."""

    planes: int
    stride: int = 1
    caffe_stride: bool = False  # stride on conv1 (layers 2-3) vs conv2
    has_downsample: bool = False
    downsample_stride: int = 1
    dropout_en: bool = False
    drop_rate: float = 0.0
    batchnorm_en: bool = True
    zero_init_residual: bool = False
    live_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, train: bool = False
    ) -> jnp.ndarray:
        bn = dict(live=self.live_bn)
        ubs = train and self.live_bn
        s1 = self.stride if self.caffe_stride else 1
        s2 = 1 if self.caffe_stride else self.stride
        identity = x

        out = _conv(self.planes, 1, s1, name="conv1")(x)
        if self.batchnorm_en:
            out = FrozenBatchNorm(self.planes, name="bn1", **bn)(out, ubs)
        out = nn.relu(out)
        if self.dropout_en:
            out = CheapDropout(self.drop_rate, name="drop1")(out, deterministic)

        out = _conv(self.planes, 3, s2, name="conv2")(out)
        if self.batchnorm_en:
            out = FrozenBatchNorm(self.planes, name="bn2", **bn)(out, ubs)
        out = nn.relu(out)
        if self.dropout_en:
            # Dropout2d parity (torch drops whole (sample, channel) planes):
            # mask (N, 1, 1, C), i.e. broadcast over the H/W dims
            out = CheapDropout(
                self.drop_rate, broadcast_dims=(1, 2), name="drop2d"
            )(out, deterministic)

        out = _conv(self.planes * 4, 1, 1, name="conv3")(out)
        if self.batchnorm_en:
            # zero_init_residual (from-scratch only, see module docstring):
            # without live batch stats, unit-scale residuals DOUBLE
            # activation variance per block (2^33 for res101) and
            # from-scratch training NaNs on the first step.
            out = FrozenBatchNorm(
                self.planes * 4, zero_scale=self.zero_init_residual,
                name="bn3", **bn
            )(out, ubs)

        if self.has_downsample:
            identity = _conv(
                self.planes * 4, 1, self.downsample_stride, name="downsample_conv"
            )(x)
            # NOT gated on batchnorm_en: the reference's bypass only skips
            # bn1/bn2/bn3 inside the block body (ref resnet.py:103-118);
            # the downsample Sequential is built by _make_layer with its
            # norm_layer unconditionally (ref resnet.py:193-197) and stays
            # in the forward path even when batchnorm_en=False — proven
            # against the reference module itself in
            # tests/test_reference_module_parity.py::test_reference_bn_bypass_layer4.
            identity = FrozenBatchNorm(
                self.planes * 4, name="downsample_bn", **bn
            )(identity, ubs)

        out = nn.relu(out + identity)
        if self.dropout_en:
            out = CheapDropout(self.drop_rate, name="drop3")(out, deterministic)
        return out


class BasicBlock(nn.Module):
    """ref resnet.py:40-72 (resnet18/34)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    zero_init_residual: bool = False
    live_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, train: bool = False
    ) -> jnp.ndarray:
        bn = dict(live=self.live_bn)
        ubs = train and self.live_bn
        identity = x
        out = _conv(self.planes, 3, self.stride, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1", **bn)(out, ubs)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, name="conv2")(out)
        out = FrozenBatchNorm(
            self.planes, zero_scale=self.zero_init_residual, name="bn2", **bn
        )(out, ubs)
        if self.has_downsample:
            identity = _conv(self.planes, 1, self.stride, name="downsample_conv")(x)
            identity = FrozenBatchNorm(
                self.planes, name="downsample_bn", **bn
            )(identity, ubs)
        return nn.relu(out + identity)


class ResStage(nn.Module):
    """One layerN group of blocks."""

    planes: int
    num_blocks: int
    stride: int = 1
    caffe_stride: bool = False
    basic: bool = False
    dropout_en: bool = False
    drop_rate: float = 0.0
    batchnorm_en: bool = True
    zero_init_residual: bool = False
    live_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, train: bool = False
    ) -> jnp.ndarray:
        expansion = 1 if self.basic else 4
        for i in range(self.num_blocks):
            stride = self.stride if i == 0 else 1
            needs_ds = i == 0 and (
                self.stride != 1 or x.shape[-1] != self.planes * expansion
            )
            if self.basic:
                x = BasicBlock(
                    self.planes,
                    stride,
                    has_downsample=needs_ds,
                    zero_init_residual=self.zero_init_residual,
                    live_bn=self.live_bn,
                    name=f"block{i}",
                )(x, deterministic, train)
            else:
                x = Bottleneck(
                    self.planes,
                    stride,
                    caffe_stride=self.caffe_stride,
                    has_downsample=needs_ds,
                    downsample_stride=stride,
                    dropout_en=self.dropout_en,
                    drop_rate=self.drop_rate,
                    batchnorm_en=self.batchnorm_en,
                    zero_init_residual=self.zero_init_residual,
                    live_bn=self.live_bn,
                    name=f"block{i}",
                )(x, deterministic, train)
        return x


# Stage-granular rematerialization: backward recomputes each stage's
# activations from its input instead of storing them — the standard TPU
# HBM/FLOPs trade (a res101 fp32 backward at detection resolutions
# otherwise overflows a v5e's 16 GB HBM).
RematResStage = nn.remat(ResStage, static_argnums=(2, 3))


class ResNetStem(nn.Module):
    """conv1/bn1/relu/maxpool (ref resnet.py:152-157); conv1 input channels
    adapt automatically to the input (3 for RGB, cfg.lidar.num_channel=15
    for BEV rasters, ref lidarnet.py:107)."""

    live_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            name="conv1",
        )(x)
        x = FrozenBatchNorm(64, name="bn1", live=self.live_bn)(
            x, train and self.live_bn
        )
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return x


class ResNetC4(nn.Module):
    """Stem + layer1..layer3 -> stride-16, 1024-ch feature (no-FPN head,
    ref imagenet.py:131-134).  layer4 lives in the detection tail."""

    num_layers: int = 101
    dropout_en: bool = False
    drop_rate: float = 0.0
    batchnorm_en: bool = True
    zero_init_residual: bool = False
    live_bn: bool = False
    remat: bool = True
    remat_stages: Tuple[int, ...] = (1, 2)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, train: bool = False
    ) -> jnp.ndarray:
        blocks = STAGE_BLOCKS[self.num_layers]
        basic = self.num_layers in BASIC_DEPTHS
        kw: dict[str, Any] = dict(
            basic=basic,
            dropout_en=self.dropout_en,
            drop_rate=self.drop_rate,
            batchnorm_en=self.batchnorm_en,
            zero_init_residual=self.zero_init_residual,
            live_bn=self.live_bn,
        )

        def stage(idx: int):
            return (
                RematResStage
                if self.remat and idx in self.remat_stages
                else ResStage
            )

        x = ResNetStem(live_bn=self.live_bn, name="stem")(x, train)
        x = stage(1)(64, blocks[0], 1, name="layer1", **kw)(x, deterministic, train)
        x = stage(2)(128, blocks[1], 2, caffe_stride=True, name="layer2", **kw)(
            x, deterministic, train
        )
        x = stage(3)(256, blocks[2], 2, caffe_stride=True, name="layer3", **kw)(
            x, deterministic, train
        )
        return x


class ResNetLayer4(nn.Module):
    """The C4 detection tail: stride-1 layer4 over pooled RoIs
    (ref resnet.py:235-238 + _head_to_tail)."""

    num_layers: int = 101
    dropout_en: bool = False
    drop_rate: float = 0.0
    batchnorm_en: bool = True
    zero_init_residual: bool = False
    live_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, train: bool = False
    ) -> jnp.ndarray:
        blocks = STAGE_BLOCKS[self.num_layers]
        return ResStage(
            512,
            blocks[3],
            stride=1,  # no-FPN: stride-1 layer4
            basic=self.num_layers in BASIC_DEPTHS,
            dropout_en=self.dropout_en,
            drop_rate=self.drop_rate,
            batchnorm_en=self.batchnorm_en,
            zero_init_residual=self.zero_init_residual,
            live_bn=self.live_bn,
            name="layer4",
        )(x, deterministic, train)


class ResNetPyramid(nn.Module):
    """Stem + layer1..4 -> (c2, c3, c4, c5) for FPN (ref imagenet.py:120-129)."""

    num_layers: int = 101
    dropout_en: bool = False
    drop_rate: float = 0.0
    batchnorm_en: bool = True
    zero_init_residual: bool = False
    live_bn: bool = False
    remat: bool = True
    remat_stages: Tuple[int, ...] = (1, 2)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        blocks = STAGE_BLOCKS[self.num_layers]
        basic = self.num_layers in BASIC_DEPTHS
        kw: dict[str, Any] = dict(
            basic=basic,
            dropout_en=self.dropout_en,
            drop_rate=self.drop_rate,
            batchnorm_en=self.batchnorm_en,
            zero_init_residual=self.zero_init_residual,
            live_bn=self.live_bn,
        )

        def stage(idx: int):
            return (
                RematResStage
                if self.remat and idx in self.remat_stages
                else ResStage
            )

        x = ResNetStem(live_bn=self.live_bn, name="stem")(x, train)
        c2 = stage(1)(64, blocks[0], 1, name="layer1", **kw)(x, deterministic, train)
        c3 = stage(2)(128, blocks[1], 2, caffe_stride=True, name="layer2", **kw)(
            c2, deterministic, train
        )
        c4 = stage(3)(256, blocks[2], 2, caffe_stride=True, name="layer3", **kw)(
            c3, deterministic, train
        )
        c5 = stage(4)(512, blocks[3], 2, name="layer4", **kw)(c4, deterministic, train)
        return c2, c3, c4, c5
