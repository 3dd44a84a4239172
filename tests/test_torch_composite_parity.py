"""FULL-DETECTOR parity vs a torch composite built from the reference's parts.

tests/test_reference_module_parity.py proves the backbones against the
reference's own modules and test_reference_detection_math_parity.py proves
each detection-math layer; this suite closes the network.py-RECONSTRUCTION
risk end-to-end (the reference does not ship network.py — its README
documents the missing base class): a working torch detector is assembled
from the reference's own `lib/nets/resnet.py` + `lib/layer_utils/
proposal_layer.py` + `lib/model/bbox_transform.py` + SURVEY-§2.1 heads, the
weights are shared with the flax FasterRCNN through utils/convert.py (and
direct head-kernel transposes), and the two detectors are compared
numerically on the same frame:

  * inference: proposals (count + coords + scores), per-roi class
    probabilities, decoded per-class boxes (ref call contract:
    lib/model/test.py:68-93),
  * training: every loss component (RPN CE / RPN smooth-L1 / det CE / det
    smooth-L1) with the sampled targets pinned to the SAME draws by
    replicating forward_train's rng splits (the target layers themselves
    are module-parity-tested separately; here they pin the composition).

RoI pooling: the torch side uses a per-sample gather-based bilinear oracle
with the repo's documented semantics (torchvision aligned=False, FIXED
sampling_ratio=2 — ops/roi_align.py module docstring records the adaptive-
ratio waiver), an independent formulation of the interpolation-matmul path.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo/tests")
from ref_shims import import_ref_detection_math, install_ref_shims  # noqa: E402

from faster_rcnn_pytorch_multimodal_tpu.config import (  # noqa: E402
    cfg_from_list,
    default_config,
)
from faster_rcnn_pytorch_multimodal_tpu.models.detector import (  # noqa: E402
    FasterRCNN,
    build_anchor_grid,
)
from faster_rcnn_pytorch_multimodal_tpu.ops.targets import (  # noqa: E402
    anchor_target,
    proposal_target,
)
from faster_rcnn_pytorch_multimodal_tpu.utils.convert import (  # noqa: E402
    load_resnet_state_dict,
)

H, W = 256, 320
K = 2  # classes
PRE_N, POST_N = 256, 32


@pytest.fixture(scope="module")
def ref():
    ns = import_ref_detection_math()
    install_ref_shims()
    import nets.resnet as ref_resnet

    ns.resnet = ref_resnet
    return ns


def _cfg():
    return cfg_from_list(
        default_config(),
        (
            "NET_TYPE", "image",
            "NET_VARIANT", "res50",
            "COMPUTE_DTYPE", "float32",
            "TRAIN.SCALES", "(1.0,)",
            "TEST.SCALES", "(1.0,)",
            "STATIC.NMS_PRE_TEST", str(PRE_N),
            "STATIC.NMS_PRE_TRAIN", str(PRE_N),
            "TEST.RPN_POST_NMS_TOP_N", str(POST_N),
            "TRAIN.RPN_POST_NMS_TOP_N", str(POST_N),
            "TRAIN.USE_GT", "False",
            "STATIC.MAX_GT", "8",
            "TRAIN.SNAPSHOT_ITERS", "1000000",
        ),
    )


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0.0, 0.05, generator=g)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.normal_(1.0, 0.2, generator=g)
                m.bias.normal_(0.0, 0.2, generator=g)
    model.eval()
    return model


class _TorchComposite:
    """Reference resnet + SURVEY-§2.1 heads, weights SHARED with the flax
    detector (backbone via utils/convert, heads via direct transposes)."""

    def __init__(self, ref, cfg, variables):
        ref.cfg.USE_FPN = False
        self.cfg = cfg
        self.resnet = _randomize(ref.resnet.resnet50(pretrained=False), 0)
        self.a = cfg.num_anchors
        nn = torch.nn
        self.rpn = nn.Conv2d(1024, cfg.rpn_channels, 3, padding=1)
        self.rpn_cls = nn.Conv2d(cfg.rpn_channels, 2 * self.a, 1)
        self.rpn_bbox = nn.Conv2d(cfg.rpn_channels, 4 * self.a, 1)
        self.cls_fc = nn.Linear(2048, K)
        self.bbox_fc = nn.Linear(2048, 4 * K)
        p = variables["params"]
        with torch.no_grad():
            self._conv(self.rpn, p["rpn"]["rpn_net"])
            self._conv(self.rpn_cls, p["rpn"]["rpn_cls_score_net"])
            self._conv(self.rpn_bbox, p["rpn"]["rpn_bbox_pred_net"])
            self._dense(self.cls_fc, p["predictors"]["cls_score_net"])
            self._dense(self.bbox_fc, p["predictors"]["bbox_pred_net"])

    @staticmethod
    def _conv(mod, leaf):
        # flax (kh, kw, in, out) -> torch (out, in, kh, kw)
        mod.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(leaf["kernel"]), (3, 2, 0, 1)).copy()))
        mod.bias.copy_(torch.from_numpy(np.asarray(leaf["bias"]).copy()))

    @staticmethod
    def _dense(mod, leaf):
        mod.weight.copy_(torch.from_numpy(
            np.asarray(leaf["kernel"]).T.copy()))
        mod.bias.copy_(torch.from_numpy(np.asarray(leaf["bias"]).copy()))

    def c4(self, x_nchw):
        r = self.resnet
        return r.layer3(r.layer2(r.layer1(
            r.maxpool(r.relu(r.bn1(r.conv1(x_nchw)))))))

    def rpn_outputs(self, c4):
        """(probs (1,h,w,2A) [bg|fg] halves, fg (N,), deltas (N,4),
        logits (N,2)) in the repo's (y, x, a) lane order."""
        r = F.relu(self.rpn(c4))
        cls = self.rpn_cls(r).permute(0, 2, 3, 1)  # (1, h, w, 2A)
        bbox = self.rpn_bbox(r).permute(0, 2, 3, 1)
        _, h, w, _ = cls.shape
        logits = cls.reshape(1, h, w, 2, self.a).permute(0, 1, 2, 4, 3)
        logits = logits.reshape(-1, 2)  # (h*w*a, 2)
        fg = F.softmax(logits, dim=1)[:, 1]
        probs = torch.cat(
            [1.0 - fg.reshape(1, h, w, self.a), fg.reshape(1, h, w, self.a)],
            dim=3,
        )
        deltas = bbox.reshape(-1, 4)
        return probs, fg, deltas, logits

    def roi_head(self, c4, rois4):
        pooled = torch_roi_align(c4[0], rois4, 1.0 / 16.0,
                                 p=self.cfg.pooling_size)
        fc7 = self.resnet.layer4(pooled).mean(dim=(2, 3))
        return self.cls_fc(fc7), self.bbox_fc(fc7)


def torch_roi_align(feat, rois, scale, p=7, sr=2):
    """Gather-based bilinear RoI-align oracle (feat (C,H,W), rois (R,4)):
    torchvision aligned=False box mapping, fixed sampling_ratio, border-
    clamped taps — the semantics ops/roi_align.py documents."""
    c, h, w = feat.shape
    s_idx = (torch.arange(p * sr, dtype=torch.float32) + 0.5) / sr
    outs = []
    for roi in rois:
        x1, y1, x2, y2 = [float(v) * scale for v in roi]
        rw, rh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        gx = torch.clamp(x1 + s_idx * (rw / p), 0.0, w - 1.0)
        gy = torch.clamp(y1 + s_idx * (rh / p), 0.0, h - 1.0)
        x0 = gx.floor().long().clamp(0, w - 1)
        x1i = (x0 + 1).clamp(max=w - 1)
        y0 = gy.floor().long().clamp(0, h - 1)
        y1i = (y0 + 1).clamp(max=h - 1)
        wx1 = (gx - x0.float()).clamp(0, 1)
        wy1 = (gy - y0.float()).clamp(0, 1)
        wx0, wy0 = 1.0 - wx1, 1.0 - wy1
        f00 = feat[:, y0][:, :, x0]
        f01 = feat[:, y0][:, :, x1i]
        f10 = feat[:, y1i][:, :, x0]
        f11 = feat[:, y1i][:, :, x1i]
        val = (f00 * (wy0[:, None] * wx0[None, :])
               + f01 * (wy0[:, None] * wx1[None, :])
               + f10 * (wy1[:, None] * wx0[None, :])
               + f11 * (wy1[:, None] * wx1[None, :]))
        outs.append(val.reshape(c, p, sr, p, sr).mean(dim=(2, 4)))
    return torch.stack(outs)


@pytest.fixture(scope="module")
def shared(ref):
    """cfg + flax detector + torch composite with SHARED weights + frame."""
    cfg = _cfg()
    model = FasterRCNN(cfg=cfg, num_classes=K)
    rng = np.random.RandomState(0)
    x = rng.uniform(-1.5, 1.5, (1, H, W, 3)).astype(np.float32)
    window = np.array([[0.0, W, 0.0, H]], np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(window)
    )
    # randomized-backbone activations reach O(100s), which saturates the
    # head logits (fg probs collapse to exact 0.0/1.0 -> mass score ties ->
    # arbitrary rankings) and explodes exp(delta) decodes; scale the head
    # kernels so scores are distinct floats and boxes stay near anchors
    try:
        import flax

        variables = flax.core.unfreeze(variables)
    except Exception:
        pass
    p = variables["params"]
    for scope, mod, s in (
        ("rpn", "rpn_cls_score_net", 1e-3),
        ("rpn", "rpn_bbox_pred_net", 1e-3),
        ("predictors", "cls_score_net", 1e-2),
        ("predictors", "bbox_pred_net", 1e-2),
    ):
        leaf = p[scope][mod]
        leaf["kernel"] = np.asarray(leaf["kernel"]) * s
        leaf["bias"] = np.zeros_like(np.asarray(leaf["bias"]))
    comp = _TorchComposite(ref, cfg, variables)
    # backbone + stride-1 layer4 tail weights: reference module -> flax
    sd = comp.resnet.state_dict()
    variables, n = load_resnet_state_dict(dict(variables), sd, use_fpn=False)
    loadable = sum(1 for k in sd
                   if "num_batches_tracked" not in k and not k.startswith("fc."))
    assert n == loadable  # every loadable reference tensor mapped
    return types_ns(cfg=cfg, model=model, variables=variables, comp=comp,
                    x=x, window=window)


def types_ns(**kw):
    import types

    return types.SimpleNamespace(**kw)


def test_composite_inference_parity(ref, shared):
    cfg, model, comp = shared.cfg, shared.model, shared.comp
    out = model.apply(
        shared.variables, jnp.asarray(shared.x), jnp.asarray(shared.window),
        method=FasterRCNN.forward_test, rngs={"dropout": jax.random.PRNGKey(0)},
    )
    valid = np.asarray(out["roi_valid"][0]).astype(bool)
    j_rois = np.asarray(out["rois"][0])[valid]
    j_scores = np.asarray(out["roi_scores"][0])[valid]
    j_cls = np.asarray(out["cls_prob"][0])[valid]
    j_boxes = np.asarray(out["bbox_pred"][0])[valid]

    # jax-side raw RPN outputs (test phase) for the head-chain comparison
    def _rpn_test(m, images):
        feats = m.features(images, deterministic=True)
        return m.rpn_scores(feats["rpn"])

    j_rpn = model.apply(
        shared.variables, jnp.asarray(shared.x), method=_rpn_test,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    j_fg = np.asarray(j_rpn["fg_prob"][0])
    j_deltas = np.asarray(j_rpn["deltas"][0])

    tx = torch.from_numpy(np.transpose(shared.x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        c4 = comp.c4(tx)
        _probs, t_fg, t_deltas, _logits = comp.rpn_outputs(c4)
        fh, fw = c4.shape[2], c4.shape[3]

        # backbone + RPN head chain (cross-backend fp noise ~1e-5)
        np.testing.assert_allclose(j_fg, t_fg.numpy(), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            j_deltas, t_deltas.numpy(), rtol=2e-3,
            atol=3e-4 * float(np.abs(j_deltas).max()))

        # proposal path on PINNED inputs: with random weights the 38k anchor
        # scores are so densely packed that sub-1e-6 backend noise reorders
        # the top-k, so the reference's proposal_layer gets the JAX scores/
        # deltas — identical ranking, divergence then isolates the
        # decode/clip/NMS/top-k machinery (the per-op math is additionally
        # parity-tested in test_reference_detection_math_parity.py)
        a = cfg.num_anchors
        probs = torch.cat(
            [torch.from_numpy(1.0 - j_fg.reshape(fh, fw, a)),
             torch.from_numpy(j_fg.reshape(fh, fw, a).copy())], dim=2)[None]
        anchors, _ = build_anchor_grid(cfg, fh, fw, 1.0)
        ref.cfg.TEST.RPN_PRE_NMS_TOP_N = PRE_N
        ref.cfg.TEST.RPN_POST_NMS_TOP_N = POST_N
        ref.cfg.TEST.RPN_NMS_THRESH = cfg.test.rpn_nms_thresh
        blob, t_scores, _a3d = ref.proposal.proposal_layer(
            probs, torch.from_numpy(j_deltas), shared.window[0], "TEST",
            torch.from_numpy(anchors), torch.zeros(anchors.shape[0], 7),
            cfg.num_anchors,
        )
        t_rois = blob[:, 1:5]

        # proposal parity (count + coords + scores, score-ordered)
        assert j_rois.shape[0] == t_rois.shape[0]
        np.testing.assert_allclose(j_rois, t_rois.numpy(), rtol=1e-4,
                                   atol=1e-3)
        np.testing.assert_allclose(j_scores, t_scores.numpy().reshape(-1),
                                   rtol=1e-5, atol=1e-6)

        # det stage on the SAME rois
        t_cls_score, t_bbox = comp.roi_head(c4, t_rois)
        t_cls = F.softmax(t_cls_score, dim=1)
        stds = torch.tensor(cfg.train.image_bbox_normalize_stds).repeat(K)
        means = torch.tensor(cfg.train.image_bbox_normalize_means).repeat(K)
        t_deltas = t_bbox * stds + means
        t_pred = ref.bbox_transform.bbox_transform_inv(t_rois, t_deltas)
        t_pred = ref.bbox_transform.clip_boxes(t_pred, shared.window[0])

    scale = float(np.abs(j_cls).max())
    np.testing.assert_allclose(j_cls, t_cls.numpy(), rtol=2e-3,
                               atol=3e-3 * scale)
    np.testing.assert_allclose(j_boxes, t_pred.numpy(), rtol=2e-3, atol=0.15)


def test_composite_train_loss_parity(ref, shared):
    """Every train-loss component, with the sampled targets pinned by
    replicating forward_train's rng splits (detector.py:658) and feeding
    the torch composite the SAME sampled rois."""
    cfg, model, comp = shared.cfg, shared.model, shared.comp
    b = 1
    g = 3
    rngs = np.random.RandomState(1)
    # plausible GT boxes inside the frame
    xy = rngs.uniform(20, 120, (g, 2))
    wh = rngs.uniform(30, 90, (g, 2))
    gt = np.concatenate(
        [xy, np.minimum(xy + wh, [W - 1.0, H - 1.0]), np.ones((g, 1))], axis=1
    ).astype(np.float32)[None]
    gt_mask = np.ones((b, g), bool)
    key = jax.random.PRNGKey(42)

    losses = model.apply(
        shared.variables, jnp.asarray(shared.x), jnp.asarray(gt),
        jnp.asarray(gt_mask), jnp.asarray(shared.window), key,
        method=FasterRCNN.forward_train, rngs={"dropout": jax.random.PRNGKey(0)},
    )

    # replicate the rng stream + proposals to pin the sampled targets
    rng_at, rng_pt, _rng_cls = jax.random.split(key, 3)

    def _rpn_path(m, images, window):
        feats = m.features(images, deterministic=True, train=True)
        rpn_out = m.rpn_scores(feats["rpn"])
        rpn_out["anchors"] = m._anchors(feats["rpn"])
        rois, scores, a3d, valid, _src = m._propose_batch(
            rpn_out, window, "train")
        return rpn_out, rois, scores, a3d, valid

    rpn_out, rois, roi_scores, roi_a3d, roi_valid = model.apply(
        shared.variables, jnp.asarray(shared.x), jnp.asarray(shared.window),
        method=_rpn_path, rngs={"dropout": jax.random.PRNGKey(0)},
    )
    anchors_bev, _ = rpn_out["anchors"]
    at = jax.vmap(
        lambda gtb, m, w, r: anchor_target(
            anchors_bev, gtb, m, w, r,
            rpn_batchsize=cfg.train.rpn_batchsize,
            fg_fraction=cfg.train.rpn_fg_fraction,
            positive_overlap=cfg.train.rpn_positive_overlap,
            negative_overlap=cfg.train.rpn_negative_overlap,
            clobber_positives=cfg.train.rpn_clobber_positives,
        )
    )(jnp.asarray(gt), jnp.asarray(gt_mask), jnp.asarray(shared.window),
      jax.random.split(rng_at, b))
    rois5 = jnp.concatenate(
        [jnp.zeros(rois.shape[:2] + (1,)), rois], axis=-1)
    means = jnp.asarray(cfg.train.image_bbox_normalize_means)
    stds = jnp.asarray(cfg.train.image_bbox_normalize_stds)
    pt = jax.vmap(
        lambda *a: proposal_target(
            *a, means, stds,
            num_classes=K, num_bbox_elem=4,
            roi_batch_size=cfg.train.roi_batch_size,
            fg_fraction=cfg.train.fg_fraction,
            fg_thresh=cfg.train.fg_thresh,
            bg_thresh_hi=cfg.train.bg_thresh_hi,
            bg_thresh_lo=cfg.train.bg_thresh_lo,
            is_lidar=False,
        )
    )(rois5, roi_scores, roi_valid, roi_a3d,
      jnp.asarray(gt), jnp.asarray(gt_mask),
      jnp.zeros((b, g, 8)), jnp.zeros((b, 1, 4)), jnp.zeros((b, 1), bool),
      jax.random.split(rng_pt, b))

    # --- torch side on the SAME sampled lanes/rois ---
    ref.cfg.NET_TYPE = "image"
    ref.cfg.UC.EN_BBOX_ALEATORIC = False
    ref.cfg.UC.EN_RPN_BBOX_ALEATORIC = False
    tx = torch.from_numpy(np.transpose(shared.x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        c4 = comp.c4(tx)
        _probs, _fg, t_deltas, t_logits = comp.rpn_outputs(c4)

        sel = np.asarray(at.sel[0])
        labels = np.asarray(at.labels[0])
        m = labels >= 0
        t_rpn_ce = F.cross_entropy(
            t_logits[torch.from_numpy(sel[m].astype(np.int64))],
            torch.from_numpy(np.clip(labels[m], 0, None).astype(np.int64)),
        )
        t_rpn_box = ref.loss.smooth_l1_loss(
            "RPN",
            t_deltas[torch.from_numpy(sel.astype(np.int64))][None],
            torch.from_numpy(np.asarray(at.bbox_targets[0]))[None],
            None,
            torch.from_numpy(np.asarray(at.bbox_inside_weights[0]))[None],
            torch.from_numpy(np.asarray(at.bbox_outside_weights[0]))[None],
            dim=[1, 2],
        )

        pt_rois = torch.from_numpy(np.asarray(pt.rois[0, :, 1:5]))
        t_cls_score, t_bbox = comp.roi_head(c4, pt_rois)
        t_ce = F.cross_entropy(
            t_cls_score,
            torch.from_numpy(np.asarray(pt.labels[0]).astype(np.int64)),
        )
        t_box = ref.loss.smooth_l1_loss(
            "DET", t_bbox,
            torch.from_numpy(np.asarray(pt.bbox_targets[0])), None,
            torch.from_numpy(np.asarray(pt.bbox_inside_weights[0])),
            torch.from_numpy(np.asarray(pt.bbox_outside_weights[0])),
            dim=[1],
        )

    for name, jv, tv in [
        ("rpn_cross_entropy", losses["rpn_cross_entropy"], t_rpn_ce),
        ("rpn_loss_box", losses["rpn_loss_box"], t_rpn_box),
        ("cross_entropy", losses["cross_entropy"], t_ce),
        ("loss_box", losses["loss_box"], t_box),
    ]:
        np.testing.assert_allclose(
            float(jv), float(tv), rtol=5e-3, atol=5e-4, err_msg=name)
