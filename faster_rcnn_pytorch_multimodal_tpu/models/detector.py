"""Two-stage Faster R-CNN detector (image 2D + LiDAR BEV 3D) with
aleatoric/epistemic uncertainty — the TPU reconstruction of the reference's
missing `lib/nets/network.py` (interface recovered in SURVEY.md §2.1).

Structure:
  * flax modules hold ONLY the learned layers (backbone, FPN, RPN head,
    tail, predictors);
  * the detection plumbing (anchors, proposal NMS, target assignment,
    RoI align, decode) is pure jnp from `ops/`, called inside the module
    methods, vmapped over the batch;
  * one jitted call covers the whole train step over a REAL batch —
    the reference's per-frame python loop with pseudo-batching
    (ref train_val.py:371-460) collapses into XLA;
  * epistemic MC-dropout runs the tail+predictors T times with distinct
    dropout rngs inside the same trace (replaces set_e_num_sample,
    ref test.py:73-77).

Shape contract (all static):
  images:      (B, H, W, C)        C=3 image / cfg.lidar.num_channel BEV
  gt_boxes:    (B, G, 5)  image    [x1,y1,x2,y2,cls], padded by gt_mask
  gt_boxes3d:  (B, G, 8)  lidar    [xc,yc,zc,l,w,h,ry,cls] voxel-grid space
  window:      (B, 4)              [xmin,xmax,ymin,ymax] valid frame extent
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_multimodal_tpu.config import Config
from faster_rcnn_pytorch_multimodal_tpu.models.fpn import FPN
from faster_rcnn_pytorch_multimodal_tpu.models.heads import (
    DetectionPredictors,
    FCTail,
    RPNHead,
)
from faster_rcnn_pytorch_multimodal_tpu.models.resnet import (
    ResNetC4,
    ResNetLayer4,
    ResNetPyramid,
)
from faster_rcnn_pytorch_multimodal_tpu.ops.anchors import (
    anchors_3d_to_bev_aabb,
    generate_3d_anchors,
    generate_anchors_pre,
)
from faster_rcnn_pytorch_multimodal_tpu.ops.box_transform import (
    bbox_transform_inv,
    clip_boxes,
    lidar_3d_bbox_transform_inv,
    lidar_3d_uncertainty_transform_inv,
    uncertainty_transform_inv,
)
from faster_rcnn_pytorch_multimodal_tpu.ops.iou import bbox_3d_to_bev_aabb
from faster_rcnn_pytorch_multimodal_tpu.ops.losses import (
    bayesian_cross_entropy,
    bayesian_cross_entropy_simple,
    bayesian_elu_cross_entropy,
    categorical_entropy,
    categorical_mutual_information,
    compute_bbox_var,
    cross_entropy,
    smooth_l1_loss,
)
from faster_rcnn_pytorch_multimodal_tpu.ops.nms import nms
from faster_rcnn_pytorch_multimodal_tpu.ops.roi_align import (
    multiscale_roi_align_batched,
    roi_align_batched,
)
from faster_rcnn_pytorch_multimodal_tpu.ops.targets import (
    anchor_target,
    effective_rpn_overlaps,
    proposal_target,
)


# ---------------------------------------------------------------------------
# Static anchor construction
# ---------------------------------------------------------------------------


def build_anchor_grid(
    cfg: Config, feat_h: int, feat_w: int, frame_scale: float
) -> Tuple[np.ndarray, np.ndarray]:
    """(anchors_bev (N,4), anchors_3d (N,7)) for the given feature grid.

    Image nets: classic 2D anchors (ref snippets.py:13-40); anchors_3d is a
    zero-filled placeholder carried for a uniform proposal interface.
    Lidar nets: AVOD grid anchors -> BEV AABB for the RPN regression
    (ref generate_3d_anchors.py + lib/utils/bbox.py:256-336).
    """
    stride = feat_stride(cfg)
    if cfg.net_type == "lidar":
        # anchor densification (cfg.lidar.anchor_substride, see config.py):
        # tile centers every stride/sub voxels on a (sub*H, sub*W) fine
        # grid, then reorder lanes to (H, W, sub_y, sub_x, A) so they line
        # up with the RPN conv's sub^2*A anchors-per-cell channel layout
        sub = cfg.lidar.anchor_substride
        assert stride % sub == 0, "anchor_substride must divide feat_stride"
        fine_stride = stride // sub
        fh, fw = feat_h * sub, feat_w * sub
        _, a3d = generate_3d_anchors(
            fh,
            fw,
            fine_stride,
            anchor_sizes_lwh=cfg.lidar.anchors,
            anchor_scales=cfg.lidar.anchor_scales,
            anchor_rotations=cfg.lidar.anchor_angles,
            voxel_len=cfg.lidar.voxel_len,
            frame_scale=frame_scale,
        )
        bev = anchors_3d_to_bev_aabb(a3d)
        # the 3D grid tiles (W*stride-1)/(H*stride-1) which can drop the last
        # row/col vs the feature grid; pad to the full fh*fw*A lane count
        a = cfg.num_anchors_3d // (sub * sub)  # anchors per FINE cell
        full = fh * fw * a
        if bev.shape[0] != full:
            grid_w = int(np.ceil((fw * fine_stride - 1) / fine_stride))
            grid_h = int(np.ceil((fh * fine_stride - 1) / fine_stride))
            bev = bev.reshape(grid_h, grid_w, a, 4)
            a3d = a3d.reshape(grid_h, grid_w, a, 7)
            pad = ((0, fh - grid_h), (0, fw - grid_w), (0, 0), (0, 0))
            bev = np.pad(bev, pad, mode="edge").reshape(full, 4)
            a3d = np.pad(a3d, pad, mode="edge").reshape(full, 7)
        if sub > 1:
            bev = (
                bev.reshape(feat_h, sub, feat_w, sub, a, 4)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(feat_h * feat_w * sub * sub * a, 4)
            )
            a3d = (
                a3d.reshape(feat_h, sub, feat_w, sub, a, 7)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(feat_h * feat_w * sub * sub * a, 7)
            )
        return bev, a3d

    anchors, n = generate_anchors_pre(
        feat_h,
        feat_w,
        stride,
        anchor_scales=cfg.anchor_scales,
        anchor_ratios=cfg.anchor_ratios,
        frame_scale=frame_scale,
    )
    return anchors, np.zeros((n, 7), np.float32)


def cast_for_compute(params, cfg: Config):
    """fp32 master params -> bf16 compute copies when cfg.compute_dtype is
    bfloat16 (cast is linear, gradients flow back to the fp32 masters).
    Live-BN running statistics (the `batch_stats` collection, present only
    when fixed_blocks == -1) are NOT cast: their momentum update reads the
    stored value every step and a bf16 round-trip would inject ~0.4%
    relative noise into the running averages."""
    if cfg.compute_dtype != "bfloat16":
        return params
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    if isinstance(params, dict) and "batch_stats" in params:
        return {
            k: (v if k == "batch_stats" else cast(v)) for k, v in params.items()
        }
    return cast(params)


def as_dropout_rng(key: jax.Array) -> jax.Array:
    """Re-seed a dropout stream on the TPU-native RBG bit generator.

    Per-element threefry mask generation measured ~30 ms/step on the
    full-UC train config (masks over (2048,7,7,512) tail activations and
    the (2048,2048) fc7, regenerated inside the remat backward).  XLA's
    RngBitGenerator emits hardware random bits at a fraction of the cost
    and is statistically more than enough for dropout.  Key derivation
    (fold_in/split) stays threefry on the 4-word key — scalar work."""
    data = jax.random.bits(key, (4,), jnp.uint32)
    return jax.random.wrap_key_data(data, impl="rbg")


def _to_f32(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.bfloat16
        else x,
        tree,
    )


def feat_stride(cfg: Config) -> int:
    """ref imagenet.py:32-48: 4 with FPN+multiscale, else 16."""
    if cfg.use_fpn and cfg.pooling_mode == "multiscale":
        return 4
    return 16


# ---------------------------------------------------------------------------
# Proposal layer (pure, single frame)
# ---------------------------------------------------------------------------


def propose_one(
    fg_scores: jnp.ndarray,
    deltas: jnp.ndarray,
    anchors_bev: jnp.ndarray,
    anchors_3d: jnp.ndarray,
    window: jnp.ndarray,
    *,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    use_nms: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RPN proposals for one frame (ref proposal_layer.py:18-57; with
    use_nms=False this is the NMS-free top-N alternative, TEST.MODE='top',
    ref proposal_top_layer.py:18-59).

    Returns (rois (P,4), scores (P,), anchors_3d (P,7), valid (P,),
    src_idx (P,)) with P = post_nms_top_n, padded lanes flagged invalid;
    src_idx is each proposal's anchor lane (for gathering per-anchor
    RPN-stage uncertainty tensors through the same keep path).
    """
    boxes = bbox_transform_inv(anchors_bev, deltas)
    boxes = clip_boxes(boxes, window)
    if not use_nms:
        k = min(post_nms_top_n, fg_scores.shape[0])
        top_scores, order = jax.lax.top_k(fg_scores, k)
        valid = jnp.ones((k,), bool)
        return boxes[order], top_scores, anchors_3d[order], valid, order
    k = min(pre_nms_top_n, fg_scores.shape[0])
    top_scores, order = jax.lax.top_k(fg_scores, k)
    top_boxes = boxes[order]
    top_a3d = anchors_3d[order]
    keep, keep_valid = nms(top_boxes, top_scores, nms_thresh, post_nms_top_n)
    return (
        top_boxes[keep],
        jnp.where(keep_valid, top_scores[keep], 0.0),
        top_a3d[keep],
        keep_valid,
        order[keep],
    )


def _mc_roi_head_chunk(mdl: "FasterRCNN", carry, xs):
    """MC-dropout chunk body for nn.scan (module passed as first arg).

    scan-of-vmapped-chunks over the sample axis: a pure vmap over all T
    samples materializes every sample's tail activations at once — T=10 x
    (B*S, 7, 7, 2048) overflows a v5e's 16 GB HBM at detection sizes — and
    a pure scan (round 2) fully serializes the T samples.  Each scan step
    vmaps a chunk of cfg.uc.e_mc_chunk samples (distinct dropout rngs from
    the lifted vmap), bounding peak memory at one CHUNK's activations while
    recovering chunk-way parallelism.  Replaces the reference's
    set_e_num_sample python loop (ref test.py:73-77).

    RoI pooling is deterministic given (feats, rois) — identical for every
    MC sample — so the caller pools ONCE and the carry holds the pooled
    features; only the dropout-bearing tail + predictors re-run per sample
    (saves T-1 RoI-aligns per step vs round 2's full roi_head body)."""
    pooled, rois = carry
    b, s = rois.shape[0], rois.shape[1]

    def one(m: "FasterRCNN", _z):
        return m.pooled_head(pooled, b, s, deterministic=False)

    out = nn.vmap(
        one,
        in_axes=0,
        out_axes=0,
        variable_axes={"params": None, "batch_stats": None},
        split_rngs={"dropout": True},
    )(mdl, xs)
    return carry, out


def _mc_rpn_scores_chunk(mdl: "FasterRCNN", images, xs):
    """RPN-stage MC-dropout chunk body for nn.scan: full backbone + RPN
    head with live dropout (the reference ran the whole net T times; here
    only the RPN outputs are kept per sample — features for the det stage
    are recomputed deterministically once).  Chunked like the det stage."""

    def one(m: "FasterRCNN", _z):
        feats = m.features(images, deterministic=False)
        return m.rpn_scores(feats["rpn"])

    out = nn.vmap(
        one,
        in_axes=0,
        out_axes=0,
        variable_axes={"params": None, "batch_stats": None},
        split_rngs={"dropout": True},
    )(mdl, xs)
    return images, out


def _chunked_mc_scan(mdl: "FasterRCNN", body, carry, t: int, chunk: int):
    """Run `body` (a chunk-shaped nn.scan body) for >= t MC samples as
    ceil(t/chunk) scan steps of vmap-`chunk`; returns outputs with a
    leading sample axis cut to exactly t."""
    chunk = max(1, min(chunk, t))
    steps = -(-t // chunk)
    scanned = nn.scan(
        body,
        variable_broadcast=["params", "batch_stats"],
        split_rngs={"dropout": True},
        length=steps,
    )
    _, out = scanned(mdl, carry, jnp.zeros((steps, chunk)))
    return jax.tree.map(
        lambda x: x.reshape((steps * chunk,) + x.shape[2:])[:t], out
    )


# ---------------------------------------------------------------------------
# The detector
# ---------------------------------------------------------------------------


class FasterRCNN(nn.Module):
    """Flagship detector module.  `cfg` and `num_classes` are static."""

    cfg: Config
    num_classes: int

    def setup(self):
        c = self.cfg
        uc = c.uc
        # backbone/tail dropout is the MC-sampling source for BOTH the
        # det-stage and the RPN-stage epistemic paths
        dropout_en = uc.any_epistemic or uc.rpn_epistemic
        resnet_drop = 0.5 if dropout_en else 0.0
        # ref imagenet.py:52-63: epistemic shrinks the det head to fc7/4
        self.fc7_channels = 2048
        self.det_channels = self.fc7_channels // 4 if dropout_en else self.fc7_channels

        if c.net_variant == "vgg16":
            from faster_rcnn_pytorch_multimodal_tpu.models.vgg16 import (
                VGG16Head,
                VGG16Tail,
            )

            assert not c.use_fpn, "FPN is resnet-only (ref imagenet.py)"
            self.fc7_channels = 4096
            self.det_channels = (
                self.fc7_channels // 4 if dropout_en else self.fc7_channels
            )
            self.backbone = VGG16Head()
            self.tail = VGG16Tail()
        elif c.net_variant == "mobile":
            from faster_rcnn_pytorch_multimodal_tpu.models.mobilenet import (
                MobileNetV1Head,
                MobileNetV1Tail,
            )

            assert not c.use_fpn, "FPN is resnet-only (ref imagenet.py)"
            self.fc7_channels = 1024
            self.det_channels = (
                self.fc7_channels // 4 if dropout_en else self.fc7_channels
            )
            mult = c.mobilenet.depth_multiplier
            self.backbone = MobileNetV1Head(depth_multiplier=mult)
            self.tail = MobileNetV1Tail(depth_multiplier=mult)
        elif c.use_fpn:
            num_layers = int(c.net_variant.replace("res", "") or 101)
            # zero-init the residual-terminator BN scale only when the BN
            # affine trains (fixed_blocks == -1, from-scratch); otherwise the
            # frozen zero would kill every residual branch (see resnet.py
            # module docstring).
            zir = c.resnet.fixed_blocks == -1
            self.backbone = ResNetPyramid(
                num_layers,
                dropout_en=dropout_en,
                drop_rate=resnet_drop,
                zero_init_residual=zir,
                live_bn=zir,
                remat=c.resnet.remat,
                remat_stages=c.resnet.remat_stages,
            )
            self.fpn = FPN(planes=256)
            self.tail = FCTail(self.fc7_channels)
        else:
            num_layers = int(c.net_variant.replace("res", "") or 101)
            zir = c.resnet.fixed_blocks == -1
            self.backbone = ResNetC4(
                num_layers,
                dropout_en=dropout_en,
                drop_rate=resnet_drop,
                zero_init_residual=zir,
                live_bn=zir,
                remat=c.resnet.remat,
                remat_stages=c.resnet.remat_stages,
            )
            self.tail = ResNetLayer4(
                num_layers,
                dropout_en=dropout_en,
                drop_rate=resnet_drop,
                zero_init_residual=zir,
                live_bn=zir,
            )
        self.rpn = RPNHead(rpn_channels=c.rpn_channels, num_anchors=c.num_anchors)
        if uc.en_rpn_bbox_aleatoric:
            self.rpn_bbox_al_var_net = nn.Conv(
                c.num_anchors * 4, (1, 1),
                kernel_init=nn.initializers.normal(0.001),
            )
        if uc.en_rpn_cls_aleatoric:
            # per-anchor 2-class logit log-variance (RPN twin of
            # cls_al_var_net, SURVEY §2.1 UC flag surface)
            self.rpn_cls_al_var_net = nn.Conv(
                c.num_anchors * 2, (1, 1),
                kernel_init=nn.initializers.normal(0.001),
            )
        self.predictors = DetectionPredictors(
            num_classes=self.num_classes,
            num_bbox_elem=c.num_bbox_elem,
            det_channels=self.det_channels,
            en_cls_aleatoric=uc.en_cls_aleatoric,
            en_bbox_aleatoric=uc.en_bbox_aleatoric,
            en_cls_epistemic=uc.en_cls_epistemic,
            en_bbox_epistemic=uc.en_bbox_epistemic,
            lidar_bn=(c.net_type == "lidar" and uc.any_epistemic),
        )

    # -- feature extraction -------------------------------------------------

    def features(
        self,
        images: jnp.ndarray,
        deterministic: bool = True,
        train: bool = False,
    ):
        if jnp.issubdtype(images.dtype, jnp.integer):
            # loaders ship raw uint8 frames (4x smaller transfers); the
            # mean/std normalization runs here on device.  Float inputs are
            # treated as pre-normalized (direct callers, lidar rasters).
            means = jnp.asarray(self.cfg.pixel_means, jnp.float32)
            stds = jnp.asarray(self.cfg.pixel_stddevs, jnp.float32)
            images = (images.astype(jnp.float32) - means) / stds
        if self.cfg.compute_dtype == "bfloat16":
            images = images.astype(jnp.bfloat16)
        is_res = self.cfg.net_variant.startswith("res")
        if self.cfg.use_fpn:
            c2, c3, c4, c5 = self.backbone(images, deterministic, train)
            p2, p3, p4, p5 = self.fpn(c2, c3, c4, c5)
            # activation summary hook (ref _act_summaries['conv'],
            # vgg16.py:51 / imagenet.py): a flax sow, materialized only
            # when applied with mutable=['intermediates'] AND the config
            # flag is on (so init never grows an extra collection)
            if self.cfg.train.en_act_summaries:
                self.sow("intermediates", "act_conv", p2)
            return {"rpn": p2, "pyramid": (p2, p3, p4, p5)}
        feat = (
            self.backbone(images, deterministic, train)
            if is_res
            else self.backbone(images, deterministic)
        )
        if self.cfg.train.en_act_summaries:
            self.sow("intermediates", "act_conv", feat)
        return {"rpn": feat, "pyramid": None}

    # -- rpn ------------------------------------------------------------

    def rpn_scores(self, rpn_feat: jnp.ndarray):
        """Returns per-anchor (fg_prob (B,N), cls_logits (B,N,2),
        bbox deltas (B,N,4)[, bbox log-var]) in (y, x, a) lane order."""
        cls, bbox = self.rpn(rpn_feat)
        b, h, w, _ = cls.shape
        a = self.cfg.num_anchors
        # channel layout [bg x A | fg x A] (ref proposal_layer.py:32 takes
        # the back half as fg scores)
        logits = cls.reshape(b, h, w, 2, a).astype(jnp.float32)
        logits = jnp.moveaxis(logits, 3, 4).reshape(b, h * w * a, 2)
        fg_prob = jax.nn.softmax(logits, axis=-1)[..., 1]
        deltas = bbox.reshape(b, h * w * a, 4).astype(jnp.float32)
        out = {"logits": logits, "fg_prob": fg_prob, "deltas": deltas}
        if self.cfg.uc.en_rpn_bbox_aleatoric:
            var = self.rpn_bbox_al_var_net(rpn_feat)
            out["bbox_al_var"] = var.reshape(b, h * w * a, 4).astype(jnp.float32)
        if self.cfg.uc.en_rpn_cls_aleatoric:
            cvar = self.rpn_cls_al_var_net(rpn_feat)
            cvar = cvar.reshape(b, h, w, 2, a).astype(jnp.float32)
            out["cls_al_var"] = jnp.moveaxis(cvar, 3, 4).reshape(b, h * w * a, 2)
        return out

    # -- roi head ---------------------------------------------------------

    def pool_rois(
        self, feats: Dict[str, Any], rois: jnp.ndarray
    ) -> jnp.ndarray:
        """RoI-align (B, S, 4) rois from the feature map(s).  Pure op — no
        params, no dropout — so MC-dropout sampling pools once and shares
        the result across samples (see _mc_roi_head_chunk)."""
        c = self.cfg
        p = c.pooling_size
        if c.use_fpn and c.pooling_mode == "multiscale":
            pyramid = feats["pyramid"]
            strides = (4, 8, 16, 32)
            return multiscale_roi_align_batched(
                pyramid, rois, strides, output_size=p
            )
        feat = feats["rpn"]
        scale = 1.0 / feat_stride(c)
        return roi_align_batched(feat, rois, scale, output_size=p)

    def roi_head(
        self,
        feats: Dict[str, Any],
        rois: jnp.ndarray,
        deterministic: bool = True,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Pool (B, S, 4) rois and run tail + predictors -> dict of (B, S, ·)."""
        pooled = self.pool_rois(feats, rois)
        b, s = rois.shape[0], rois.shape[1]
        return self.pooled_head(pooled, b, s, deterministic, train)

    def pooled_head(
        self,
        pooled: jnp.ndarray,
        b: int,
        s: int,
        deterministic: bool = True,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Tail + predictors over already-pooled RoI features."""
        c = self.cfg
        p = c.pooling_size
        if c.use_fpn:
            flat = pooled.reshape(b * s, -1)
            fc7 = self.tail(flat, deterministic)
        else:
            tail_in = pooled.reshape(b * s, p, p, pooled.shape[-1])
            tail_out = (
                self.tail(tail_in, deterministic, train)
                if c.net_variant.startswith("res")
                else self.tail(tail_in, deterministic)
            )
            # conv tails (resnet layer4) need the global avg pool; fc tails
            # (vgg16 fc6/7, mobilenet) already return flat features
            fc7 = (
                jnp.mean(tail_out, axis=(1, 2))
                if tail_out.ndim == 4
                else tail_out
            )
        out = self.predictors(fc7, deterministic)
        return {
            k: v.reshape(b, s, -1).astype(jnp.float32) for k, v in out.items()
        }

    # -- full passes --------------------------------------------------------

    def __call__(self, images: jnp.ndarray, window: jnp.ndarray):
        """Parameter-shape-only forward for init: touches every submodule
        (backbone, fpn, rpn, rpn var head, tail, predictors) WITHOUT the
        proposal/NMS/target graph — init compiles in seconds instead of
        tracing the full detection pipeline."""
        feats = self.features(images, deterministic=True)
        rpn_out = self.rpn_scores(feats["rpn"])
        b = images.shape[0]
        dummy_rois = jnp.tile(
            jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (b, 4, 1)
        )
        det = self.roi_head(feats, dummy_rois, deterministic=True)
        return {"rpn": rpn_out["fg_prob"], **det}

    def _anchors(self, rpn_feat, phase: str = "train", scale_idx=None):
        h, w = rpn_feat.shape[1:3]
        # anchor sizes scale with the frame scale of the active phase
        # (ref snippets.py:22: anchor_scales * frame_scale)
        scales = self.cfg.phase(phase).scales
        if scale_idx is None or len(scales) == 1 or self.cfg.net_type == "lidar":
            bev, a3d = build_anchor_grid(self.cfg, h, w, float(scales[0]))
            return jnp.asarray(bev), jnp.asarray(a3d)
        # random multi-scale training (ref minibatch.py:113-120): the grid
        # for EVERY configured scale is baked at trace time (shapes are
        # scale-independent) and the minibatch's traced scale_idx selects —
        # no recompile per sampled scale.  generate_anchors' rounding makes
        # the grids non-affine in scale, so precompute-and-select, not
        # center+scale*offset.
        grids = [build_anchor_grid(self.cfg, h, w, float(s)) for s in scales]
        bev = jnp.asarray(np.stack([g[0] for g in grids]))[scale_idx]
        a3d = jnp.asarray(np.stack([g[1] for g in grids]))[scale_idx]
        return bev, a3d

    def _propose_batch(self, rpn_out, window, phase: str):
        c = self.cfg.phase(phase)
        static = self.cfg.static
        pre_n = (
            static.nms_pre_train if phase == "train" else static.nms_pre_test
        )
        # TEST.MODE='top': NMS-free pure top-N selection (ref config.py:263-266)
        top_mode = phase == "test" and getattr(c, "mode", "nms") == "top"
        post_n = c.rpn_top_n if top_mode else c.rpn_post_nms_top_n
        return jax.vmap(
            partial(
                propose_one,
                pre_nms_top_n=min(pre_n, c.rpn_pre_nms_top_n),
                post_nms_top_n=post_n,
                nms_thresh=c.rpn_nms_thresh,
                use_nms=not top_mode,
            ),
            in_axes=(0, 0, None, None, 0),
        )(
            rpn_out["fg_prob"],
            rpn_out["deltas"],
            *rpn_out["anchors"],
            window,
        )

    def forward_train(
        self,
        images: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_mask: jnp.ndarray,
        window: jnp.ndarray,
        rng: jax.Array,
        gt_boxes_dc: Optional[jnp.ndarray] = None,
        dc_mask: Optional[jnp.ndarray] = None,
        scale_idx: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Full training forward -> loss dict.

        gt_boxes: (B, G, 5) for image nets, (B, G, 8) 7-DoF for lidar.
        scale_idx: optional TRAIN.SCALES index for random multi-scale
        minibatches (selects the matching precomputed anchor grid).
        """
        c = self.cfg
        b, g = gt_boxes.shape[:2]
        is_lidar = c.net_type == "lidar"
        if gt_boxes_dc is None:
            gt_boxes_dc = jnp.zeros((b, 1, 4))
            dc_mask = jnp.zeros((b, 1), bool)

        if is_lidar:
            gt_bev = jnp.concatenate(
                [bbox_3d_to_bev_aabb(gt_boxes[..., :7]), gt_boxes[..., 7:8]],
                axis=-1,
            )
            true_gt = gt_boxes
        else:
            gt_bev = gt_boxes
            true_gt = jnp.zeros((b, g, 8))

        feats = self.features(
            images, deterministic=not c.uc.any_epistemic, train=True
        )
        rpn_out = self.rpn_scores(feats["rpn"])
        rpn_out["anchors"] = self._anchors(feats["rpn"], scale_idx=scale_idx)
        anchors_bev, anchors_3d = rpn_out["anchors"]

        rng_at, rng_pt, rng_cls = jax.random.split(rng, 3)

        # --- RPN targets (vmapped per frame) ---
        pos_ov, neg_ov = effective_rpn_overlaps(c)
        at = jax.vmap(
            partial(
                anchor_target,
                rpn_batchsize=c.train.rpn_batchsize,
                fg_fraction=c.train.rpn_fg_fraction,
                positive_overlap=pos_ov,
                negative_overlap=neg_ov,
                clobber_positives=c.train.rpn_clobber_positives,
            ),
            in_axes=(None, 0, 0, 0, 0),
        )(
            anchors_bev,
            gt_bev,
            gt_mask,
            window,
            jax.random.split(rng_at, b),
        )

        # --- proposals ---
        rois, roi_scores, roi_a3d, roi_valid, _roi_src = self._propose_batch(
            rpn_out, window, "train"
        )
        if c.train.use_gt:
            # add GT boxes to the candidate pool (ref proposal_target_layer
            # .py:35-41): guarantees foreground RoIs while the RPN is
            # immature; anchors_3d slots carry the true 7-DoF boxes.
            # With TRAIN.USE_GT_NOISE (extension, default off = exact-GT
            # reference parity) the corners are jittered by ~3% of the box
            # size — training the classifier on pixel-perfect RoIs makes it
            # under-score real proposals at test time (observed on the
            # synthetic benchmark).
            gt_boxes4 = gt_bev[..., :4]
            if c.train.use_gt_noise:
                gw = gt_bev[..., 2] - gt_bev[..., 0]
                gh = gt_bev[..., 3] - gt_bev[..., 1]
                size = jnp.stack([gw, gh, gw, gh], axis=-1)
                gt_boxes4 = gt_boxes4 + (
                    jax.random.normal(
                        jax.random.fold_in(rng, 7), gt_boxes4.shape
                    )
                    * 0.03
                    * size
                )
            rois = jnp.concatenate([rois, gt_boxes4], axis=1)
            roi_scores = jnp.concatenate(
                [roi_scores, jnp.zeros(gt_mask.shape)], axis=1
            )
            roi_valid = jnp.concatenate([roi_valid, gt_mask], axis=1)
            roi_a3d = jnp.concatenate([roi_a3d, true_gt[..., :7]], axis=1)
        rois5 = jnp.concatenate(
            [jnp.zeros(rois.shape[:2] + (1,)), rois], axis=-1
        )

        # --- 2nd-stage targets ---
        means = jnp.asarray(
            c.train.lidar_bbox_normalize_means
            if is_lidar
            else c.train.image_bbox_normalize_means
        )
        stds = jnp.asarray(
            c.train.lidar_bbox_normalize_stds
            if is_lidar
            else c.train.image_bbox_normalize_stds
        )
        pt = jax.vmap(
            partial(
                proposal_target,
                num_classes=self.num_classes,
                num_bbox_elem=c.num_bbox_elem,
                roi_batch_size=c.train.roi_batch_size,
                fg_fraction=c.train.fg_fraction,
                fg_thresh=c.train.fg_thresh,
                bg_thresh_hi=c.train.bg_thresh_hi,
                bg_thresh_lo=c.train.bg_thresh_lo,
                is_lidar=is_lidar,
                ignore_dc=c.train.ignore_dc,
                dc_thresh=c.train.dc_thresh,
            ),
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, None),
        )(
            rois5,
            roi_scores,
            roi_valid,
            roi_a3d,
            gt_bev,
            gt_mask,
            true_gt,
            gt_boxes_dc,
            dc_mask,
            jax.random.split(rng_pt, b),
            means,
            stds,
        )

        losses: Dict[str, jnp.ndarray] = {}

        # --- RPN losses (ref SURVEY §2.1: CE over the 256 sampled anchors,
        # smooth-L1 with inside/outside weights) ---
        # anchor_target returns COMPACT K-lane outputs (K ~ 384 of 768k at
        # FPN stride 4) plus the sampled lane ids; gather the RPN head's
        # per-lane outputs at those ids so every loss runs on K lanes
        labels = at.labels  # (B, K)
        lbl_w = (labels >= 0).astype(jnp.float32)
        sel3 = at.sel[:, :, None]
        sel_logits = jnp.take_along_axis(rpn_out["logits"], sel3, axis=1)
        if c.uc.en_rpn_cls_aleatoric:
            # Bayesian CE over the sampled anchor batch (logit distortion
            # over all lanes x 200 draws would be prohibitive)
            sel_var = jnp.exp(
                jnp.take_along_axis(rpn_out["cls_al_var"], sel3, axis=1)
            )
            ce_s, _mi = bayesian_cross_entropy(
                sel_logits.reshape(-1, 2),
                sel_var.reshape(-1, 2),
                jnp.clip(labels, 0).astype(jnp.int32).reshape(-1),
                c.uc.a_num_ce_sample,
                jax.random.fold_in(rng_cls, 3),
                weights=lbl_w.reshape(-1),
            )
            losses["rpn_cross_entropy"] = ce_s
        else:
            losses["rpn_cross_entropy"] = cross_entropy(
                sel_logits.reshape(-1, 2),
                jnp.clip(labels, 0).astype(jnp.int32).reshape(-1),
                weights=lbl_w.reshape(-1),
            )
        losses["rpn_loss_box"] = smooth_l1_loss(
            jnp.take_along_axis(rpn_out["deltas"], sel3, axis=1),
            at.bbox_targets,
            at.bbox_inside_weights,
            at.bbox_outside_weights,
            bbox_var=jnp.take_along_axis(rpn_out["bbox_al_var"], sel3, axis=1)
            if c.uc.en_rpn_bbox_aleatoric
            else None,
            sum_axes=(1, 2),
        )

        if c.enable_full_net:
            det = self.roi_head(
                feats,
                pt.rois[..., 1:5],
                deterministic=not c.uc.any_epistemic,
                train=True,
            )
            s = c.train.roi_batch_size
            cls_score = det["cls_score"].reshape(b * s, -1)
            det_labels = pt.labels.reshape(-1)
            if c.uc.en_cls_aleatoric:
                cls_var = jnp.exp(det["cls_al_var"].reshape(b * s, -1))
                # UC.BAYES_VARIANT selects among the reference's three
                # Bayesian CE formulations (ref loss_utils.py:149-209)
                bayes_fn = {
                    "full": bayesian_cross_entropy,
                    "simple": bayesian_cross_entropy_simple,
                    "elu": bayesian_elu_cross_entropy,
                }[c.uc.bayes_variant]
                ce, a_mi = bayes_fn(
                    cls_score,
                    cls_var,
                    det_labels,
                    c.uc.a_num_ce_sample,
                    rng_cls,
                )
                losses["cross_entropy"] = ce
                losses["a_mutual_info"] = jnp.mean(a_mi)
            else:
                losses["cross_entropy"] = cross_entropy(cls_score, det_labels)
            losses["loss_box"] = smooth_l1_loss(
                det["bbox_pred"],
                pt.bbox_targets,
                pt.bbox_inside_weights,
                pt.bbox_outside_weights,
                bbox_var=det.get("bbox_al_var") if c.uc.en_bbox_aleatoric else None,
                lidar_det=is_lidar,
                en_ry_sin=c.lidar.en_ry_sin,
                reg_loss_weight=c.lidar.reg_loss_weight,
                sum_axes=(2,),
            )
        else:
            losses["cross_entropy"] = jnp.float32(0.0)
            losses["loss_box"] = jnp.float32(0.0)

        losses["total_loss"] = (
            losses["rpn_cross_entropy"]
            + losses["rpn_loss_box"]
            + losses["cross_entropy"]
            + losses["loss_box"]
        )
        return losses

    def _test_rng(self) -> jnp.ndarray:
        """Fresh noise per forward for test-time aleatoric logit sampling:
        the reference draws new normals every forward (torch.randn, ref
        lib/model/test.py sampling); reusing one fixed key would correlate
        the noise across every frame of every batch.  Falls back to a fixed
        key only when the caller provides no dropout rng."""
        if self.has_rng("dropout"):
            return self.make_rng("dropout")
        return jax.random.PRNGKey(0)

    def _rpn_uncertainties(
        self,
        rpn_out: Dict[str, jnp.ndarray],
        rpn_samples: Optional[Dict[str, jnp.ndarray]],
        rois: jnp.ndarray,
        roi_src: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """RPN-stage uncertainty outputs gathered at the selected proposals
        (per-anchor tensors -> (B, P, ·) via each proposal's anchor lane).
        Mirrors the det-stage 8-key math at the RPN (SURVEY §2.1 RPN UC
        flags; consumers were in the reference's missing network.py)."""
        uc = self.cfg.uc
        un: Dict[str, jnp.ndarray] = {}
        if not (uc.rpn_epistemic or uc.en_rpn_cls_aleatoric or uc.en_rpn_bbox_aleatoric):
            return un

        def sel(x):  # (B, N, ...) -> (B, P, ...)
            idx = roi_src
            while idx.ndim < x.ndim:
                idx = idx[..., None]
            return jnp.take_along_axis(x, idx, axis=1)

        b, p = roi_src.shape
        if uc.en_rpn_cls_aleatoric:
            logits = sel(rpn_out["logits"])  # (B, P, 2)
            cls_var = jnp.exp(sel(rpn_out["cls_al_var"]))
            noise = jax.random.normal(
                self._test_rng(), (uc.a_num_ce_sample,) + logits.shape
            )
            samples = logits[None] + noise * jnp.sqrt(cls_var)[None]
            sm = jax.nn.softmax(samples, axis=-1)
            un["a_entropy"] = categorical_entropy(jnp.mean(sm, axis=0))
            flat = samples.reshape(uc.a_num_ce_sample, b * p, 2)
            un["a_mutual_info"] = categorical_mutual_information(flat).reshape(b, p)
            un["a_cls_var"] = cls_var
        if uc.en_rpn_bbox_aleatoric:
            a_var = jnp.exp(sel(rpn_out["bbox_al_var"]))  # (B, P, 4)
            un["a_bbox_var"] = jax.vmap(uncertainty_transform_inv)(
                rois, jnp.sqrt(a_var)
            )
        if rpn_samples is not None:
            t = rpn_samples["fg_prob"].shape[0]
            sel_t = jax.vmap(sel)
            if uc.en_rpn_cls_epistemic:
                logits_t = sel_t(rpn_samples["logits"])  # (T, B, P, 2)
                sm = jax.nn.softmax(logits_t, axis=-1)
                un["e_entropy"] = categorical_entropy(jnp.mean(sm, axis=0))
                un["e_mutual_info"] = categorical_mutual_information(
                    logits_t.reshape(t, b * p, 2)
                ).reshape(b, p)
                un["e_cls_var"] = compute_bbox_var(sm)
            if uc.en_rpn_bbox_epistemic:
                deltas_t = sel_t(rpn_samples["deltas"])  # (T, B, P, 4)
                un["e_bbox_var"] = compute_bbox_var(deltas_t)
        return un

    def forward_test(
        self,
        images: jnp.ndarray,
        window: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """Inference -> per-roi class probs, decoded per-class boxes, rois,
        and the 8-key uncertainty dict (ref test_frame, SURVEY §2.1;
        consumer: lib/utils/filter_predictions.py:75-130)."""
        c = self.cfg
        is_lidar = c.net_type == "lidar"
        uc = c.uc

        feats = self.features(images, deterministic=True)
        rpn_samples = None
        if uc.rpn_epistemic:
            # RPN-stage MC dropout (SURVEY §2.1 RPN UC flags): T samples of
            # backbone+RPN with split dropout rngs, chunk-scanned like the
            # det stage; proposals come from the sample-mean scores/deltas
            rpn_samples = _chunked_mc_scan(
                self, _mc_rpn_scores_chunk, images, uc.e_num_sample,
                uc.e_mc_chunk_test or uc.e_mc_chunk,
            )  # dict of (T, B, N, ·)
            rpn_out = {
                "fg_prob": jnp.mean(rpn_samples["fg_prob"], axis=0),
                "deltas": jnp.mean(rpn_samples["deltas"], axis=0),
                "logits": rpn_samples["logits"][0],
            }
            for k in ("bbox_al_var", "cls_al_var"):
                if k in rpn_samples:
                    rpn_out[k] = rpn_samples[k][0]
        else:
            rpn_out = self.rpn_scores(feats["rpn"])
        rpn_out["anchors"] = self._anchors(feats["rpn"], phase="test")
        rois, roi_scores, roi_a3d, roi_valid, roi_src = self._propose_batch(
            rpn_out, window, "test"
        )
        b, s = rois.shape[:2]
        rpn_un = self._rpn_uncertainties(rpn_out, rpn_samples, rois, roi_src)

        if not c.enable_full_net:
            return {
                "rois": rois,
                "roi_scores": roi_scores,
                "roi_valid": roi_valid,
                "anchors_3d": roi_a3d,
                "rpn_uncertainties": rpn_un,
            }

        t = uc.e_num_sample if uc.any_epistemic else 1
        if uc.any_epistemic:
            # MC dropout as a chunk-scanned sample axis: params broadcast,
            # dropout rng splits per sample — one traced tail instead of T
            # unrolled copies, with one chunk's peak memory (see
            # _mc_roi_head_chunk)
            pooled = self.pool_rois(feats, rois)
            det = _chunked_mc_scan(
                self, _mc_roi_head_chunk, (pooled, rois), t,
                uc.e_mc_chunk_test or uc.e_mc_chunk,
            )  # dict of (T, B, S, ·)
        else:
            det = jax.tree.map(
                lambda x: x[None], self.roi_head(feats, rois, deterministic=True)
            )
        det0 = jax.tree.map(lambda x: x[0], det)  # sample-independent heads
        cls_scores = det["cls_score"]  # (T, B, S, K)
        bbox_preds = det["bbox_pred"]

        cls_prob = jnp.mean(jax.nn.softmax(cls_scores, axis=-1), axis=0)
        bbox_pred = jnp.mean(bbox_preds, axis=0)  # (B, S, EK)

        # un-normalize deltas (train targets were mean/std normalized)
        e = c.num_bbox_elem
        means = jnp.asarray(
            c.train.lidar_bbox_normalize_means
            if is_lidar
            else c.train.image_bbox_normalize_means
        )
        stds = jnp.asarray(
            c.train.lidar_bbox_normalize_stds
            if is_lidar
            else c.train.image_bbox_normalize_stds
        )
        k = self.num_classes
        deltas = bbox_pred.reshape(b, s, k, e) * stds + means
        deltas = deltas.reshape(b, s, k * e)

        if is_lidar:
            pred_boxes = jax.vmap(lidar_3d_bbox_transform_inv)(rois, roi_a3d, deltas)
        else:
            pred_boxes = jax.vmap(bbox_transform_inv)(rois, deltas)
            pred_boxes = jax.vmap(clip_boxes)(pred_boxes, window)

        out = {
            "rois": rois,
            "roi_scores": roi_scores,
            "roi_valid": roi_valid,
            "anchors_3d": roi_a3d,
            "cls_prob": cls_prob,
            "bbox_pred": pred_boxes,
            "uncertainties": {},
            "rpn_uncertainties": rpn_un,
        }

        un: Dict[str, jnp.ndarray] = {}
        if uc.en_cls_aleatoric:
            cls_var = jnp.exp(det0["cls_al_var"])  # (B,S,K)
            rng = self._test_rng()
            samples = (
                cls_scores[0][None]
                + jax.random.normal(
                    rng, (uc.a_num_ce_sample,) + cls_scores[0].shape
                )
                * jnp.sqrt(cls_var)[None]
            )
            sm = jax.nn.softmax(samples, axis=-1)
            avg = jnp.mean(sm, axis=0)
            un["a_entropy"] = categorical_entropy(avg)
            flat = samples.reshape(uc.a_num_ce_sample, b * s, k)
            un["a_mutual_info"] = categorical_mutual_information(flat).reshape(b, s)
            un["a_cls_var"] = cls_var
        if uc.en_bbox_aleatoric:
            a_var = jnp.exp(det0["bbox_al_var"])  # (B,S,EK) variance
            if is_lidar:
                un["a_bbox_var"] = jax.vmap(lidar_3d_uncertainty_transform_inv)(
                    rois, roi_a3d, jnp.sqrt(a_var)
                )
            else:
                un["a_bbox_var"] = jax.vmap(uncertainty_transform_inv)(
                    rois, jnp.sqrt(a_var)
                )
        if uc.en_cls_epistemic:
            sm = jax.nn.softmax(cls_scores, axis=-1)  # (T,B,S,K)
            un["e_entropy"] = categorical_entropy(jnp.mean(sm, axis=0))
            flat = cls_scores.reshape(t, b * s, k)
            un["e_mutual_info"] = categorical_mutual_information(flat).reshape(b, s)
            un["e_cls_var"] = compute_bbox_var(sm)
        if uc.en_bbox_epistemic:
            e_var = compute_bbox_var(bbox_preds)  # delta-space variance
            if uc.en_bbox_epistemic_inv_transform:
                if is_lidar:
                    e_var = jax.vmap(lidar_3d_uncertainty_transform_inv)(
                        rois, roi_a3d, jnp.sqrt(e_var)
                    )
                else:
                    e_var = jax.vmap(uncertainty_transform_inv)(
                        rois, jnp.sqrt(e_var)
                    )
            un["e_bbox_var"] = e_var
        out["uncertainties"] = un
        return out


@flax.struct.dataclass
class TrainState:
    """Parameters + optimizer state + step (orbax-checkpointable pytree)."""

    params: Any
    opt_state: Any
    step: jnp.ndarray
