"""Diagnose from-scratch BEV convergence on ONE frozen synthetic frame.

Round-3 instrumentation for the "BEV does not converge from scratch"
finding (VERDICT r2, weak #5): overfit a single synthetic lidar frame
(the DEBUG.FREEZE_DB scenario) and report, stage by stage, where recall
dies:

  A. anchor grid vs GT: per-GT best IoU + counts over the RPN pos/neg
     thresholds (anchor-shape vs synthetic-box-shape sanity),
  B. anchor_target: fg/bg sample counts actually fed to the RPN loss,
  C. training loop: losses + RPN proposal recall@0.5 every eval_every
     iters (proposals from the current params on the SAME frame).

Runs on CPU by default so it never contends with a TPU bench
(JAX_PLATFORMS honored if set by the caller).

Usage: python tools/diag_bev_overfit.py --iters 600 --eval_every 100
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "JAX_PLATFORMS" not in os.environ:
    os.environ["JAX_PLATFORMS"] = "cpu"


def build_cfg(net: str, substride: int = 1, pos: float = -1.0, neg: float = -1.0,
              freeze_ind: int = -1):
    from faster_rcnn_pytorch_multimodal_tpu.config import (
        cfg_from_list,
        default_config,
    )

    return cfg_from_list(
        default_config(),
        (
            "NET_TYPE", "lidar",
            "NET_VARIANT", net,
            "TRAIN.SCALES", "(0.5,)",
            "TEST.SCALES", "(0.5,)",  # eval on the SAME frozen frame
            "TRAIN.RPN_POST_NMS_TOP_N", "512",
            "STATIC.NMS_PRE_TRAIN", "1024",
            "STATIC.MAX_GT", "16",
            "STATIC.MAX_POINTS", "16384",
            "RESNET.FIXED_BLOCKS", "-1",  # from scratch: BN must train
            "DEBUG.FREEZE_DB", "True",
            "LIDAR.ANCHOR_SUBSTRIDE", str(substride),
            "LIDAR.RPN_POSITIVE_OVERLAP", str(pos),
            "LIDAR.RPN_NEGATIVE_OVERLAP", str(neg),
        )
        + (("DEBUG.FREEZE_DB_INDS", str(freeze_ind)) if freeze_ind >= 0 else ()),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--eval_every", type=int, default=100)
    ap.add_argument("--net", default="res18")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--substride", type=int, default=1)
    ap.add_argument("--pos", type=float, default=-1.0)
    ap.add_argument("--neg", type=float, default=-1.0)
    ap.add_argument("--freeze_ind", type=int, default=-1,
                    help="DEBUG.FREEZE_DB_INDS (suite bev_overfit uses 0)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from faster_rcnn_pytorch_multimodal_tpu.data import (
        BatchLoader,
        SyntheticDataset,
    )
    from faster_rcnn_pytorch_multimodal_tpu.models.detector import (
        FasterRCNN,
        build_anchor_grid,
        cast_for_compute,
        feat_stride,
    )
    from faster_rcnn_pytorch_multimodal_tpu.ops.iou import (
        bbox_3d_to_bev_aabb,
        bbox_overlaps,
    )
    from faster_rcnn_pytorch_multimodal_tpu.ops.targets import anchor_target
    from faster_rcnn_pytorch_multimodal_tpu.training.solver import (
        create_train_state,
        make_train_step,
    )

    cfg = build_cfg(args.net, args.substride, args.pos, args.neg,
                    args.freeze_ind)
    if args.lr is not None:
        from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list

        cfg = cfg_from_list(cfg, ("TRAIN.LEARNING_RATE", str(args.lr)))
    ds = SyntheticDataset(cfg, num_frames=8, num_classes=2, seed=0)
    loader = BatchLoader(ds, cfg, batch_size=1, seed=0, augment=False)
    batch = {k: jnp.asarray(v) for k, v in loader.next().items()}
    raster = batch["data"]
    print(f"raster {raster.shape} window {np.asarray(batch['window'][0])}")

    gt7 = batch["gt_boxes"][0]
    gt_mask = np.asarray(batch["gt_mask"][0]).astype(bool)
    gt_bev = np.asarray(bbox_3d_to_bev_aabb(gt7[:, :7]))[gt_mask]
    n_gt = int(gt_mask.sum())
    print(f"\n=== frame 0: {n_gt} GT boxes (voxel-grid BEV AABBs) ===")
    for i, b in enumerate(gt_bev):
        print(
            f"  gt[{i}] x1y1x2y2=({b[0]:.1f},{b[1]:.1f},{b[2]:.1f},{b[3]:.1f})"
            f" wh=({b[2] - b[0]:.1f},{b[3] - b[1]:.1f})"
        )

    # --- stage A: anchor grid vs GT IoU ---
    stride = feat_stride(cfg)
    fh = raster.shape[1] // stride
    fw = raster.shape[2] // stride
    anchors_bev, _ = build_anchor_grid(cfg, fh, fw, float(cfg.train.scales[0]))
    print(
        f"\n=== A. anchors: {anchors_bev.shape[0]} lanes"
        f" (feat {fh}x{fw}, stride {stride}) ==="
    )
    ex = anchors_bev[: cfg.num_anchors_3d]
    for i, a in enumerate(ex):
        print(
            f"  anchor[{i}] wh=({a[2] - a[0]:.1f},{a[3] - a[1]:.1f})"
        )
    iou = np.asarray(bbox_overlaps(jnp.asarray(anchors_bev), jnp.asarray(gt_bev)))
    pos = cfg.lidar.rpn_positive_overlap
    if pos <= 0:
        pos = cfg.train.rpn_positive_overlap
    neg_t = cfg.lidar.rpn_negative_overlap
    if neg_t <= 0:
        neg_t = cfg.train.rpn_negative_overlap
    neg = neg_t
    for i in range(n_gt):
        col = iou[:, i]
        print(
            f"  gt[{i}] best IoU {col.max():.3f} | >= {pos}: {(col >= pos).sum()}"
            f" | >= 0.5: {(col >= 0.5).sum()} | >= {neg}: {(col >= neg).sum()}"
        )

    # --- stage B: anchor_target sampling ---
    at = anchor_target(
        jnp.asarray(anchors_bev),
        batch["gt_boxes"][0] if batch["gt_boxes"].shape[-1] == 5
        else jnp.concatenate(
            [bbox_3d_to_bev_aabb(gt7[:, :7]), gt7[:, 7:8]], axis=-1
        ),
        batch["gt_mask"][0],
        batch["window"][0],
        jax.random.PRNGKey(0),
        rpn_batchsize=cfg.train.rpn_batchsize,
        fg_fraction=cfg.train.rpn_fg_fraction,
        positive_overlap=pos,
        negative_overlap=neg_t,
        clobber_positives=cfg.train.rpn_clobber_positives,
    )
    labels = np.asarray(at.labels)
    print(
        f"\n=== B. anchor_target: fg={int((labels == 1).sum())}"
        f" bg={int((labels == 0).sum())} of K={labels.shape[0]} slots ==="
    )

    # --- stage C: overfit + proposal recall ---
    model = FasterRCNN(cfg=cfg, num_classes=2)
    rng = jax.random.PRNGKey(0)
    state, opt = create_train_state(model, cfg, rng, loader.peek())
    step = make_train_step(model, opt)

    fwd = jax.jit(
        lambda p, d, w: model.apply(
            cast_for_compute(p, cfg), d, w, method=FasterRCNN.forward_test,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
    )

    from faster_rcnn_pytorch_multimodal_tpu.evaluation.eval_utils import ap as ap_fn
    from faster_rcnn_pytorch_multimodal_tpu.ops.filter import filter_detections

    def ap05(dets_bev: np.ndarray, scores: np.ndarray) -> float:
        """Single-frame ranked AP@0.5 (BEV AABB IoU) for class 1."""
        if dets_bev.shape[0] == 0:
            return 0.0
        order = np.argsort(-scores)
        taken = np.zeros(n_gt, bool)
        tp = np.zeros(len(order))
        for r, d in enumerate(order):
            ious = np.asarray(
                bbox_overlaps(
                    jnp.asarray(dets_bev[d : d + 1]), jnp.asarray(gt_bev)
                )
            )[0]
            j = int(ious.argmax())
            if ious[j] >= 0.5 and not taken[j]:
                taken[j] = True
                tp[r] = 1.0
        fp = 1.0 - tp
        rec = np.cumsum(tp) / max(n_gt, 1)
        prec = np.cumsum(tp) / np.maximum(np.cumsum(tp) + np.cumsum(fp), 1e-9)
        return float(ap_fn(rec, prec))

    def recall(params):
        out = fwd(params, raster, batch["window"])
        rois = np.asarray(out["rois"][0])  # (P, 4) BEV
        iou_p = np.asarray(
            bbox_overlaps(jnp.asarray(rois), jnp.asarray(gt_bev))
        )
        best = iou_p.max(axis=0)
        # final-detection AP@0.5 (class 1) through the real filter path
        filt = filter_detections(
            out["cls_prob"][0],
            out["bbox_pred"][0],
            out["roi_valid"][0],
            num_classes=2,
            bbox_elem=7,
            max_dets=cfg.test.max_dets,
            thresh=0.0,
            nms_thresh=cfg.test.nms_thresh,
            is_lidar=True,
            rotated_nms=cfg.test.rotated_nms,
        )
        keep = np.asarray(filt["valid"][1]).astype(bool)
        boxes7 = np.asarray(filt["boxes"][1])[keep]
        scores = np.asarray(filt["scores"][1])[keep]
        dets_bev = (
            np.asarray(bbox_3d_to_bev_aabb(jnp.asarray(boxes7)))
            if boxes7.shape[0]
            else np.zeros((0, 4))
        )
        # per-GT best FINAL-det 3D IoU (the suite's scoring geometry —
        # BEV-fine / 3D-poor exposes z/height regression error)
        from faster_rcnn_pytorch_multimodal_tpu.evaluation.eval_utils import (
            iou as eval_iou,
        )
        gt7_np = np.asarray(gt7[:, :7])[gt_mask]
        best3d = np.zeros(n_gt)
        for b7 in boxes7:
            best3d = np.maximum(best3d, eval_iou(gt7_np, b7, "3d"))
        return (float((best >= 0.5).mean()), best, ap05(dets_bev, scores),
                best3d)

    print(f"\n=== C. overfit {args.iters} iters (lr={cfg.train.learning_rate}) ===")
    for it in range(1, args.iters + 1):
        state, losses = step(state, batch, rng)
        if it % args.eval_every == 0 or it == 1:
            r, best, ap, best3d = recall(state.params)
            ls = {k: float(v) for k, v in losses.items()}
            print(
                f"  iter {it:4d} total={ls['total_loss']:.4f}"
                f" rpn_ce={ls['rpn_cross_entropy']:.4f}"
                f" rpn_box={ls['rpn_loss_box']:.4f}"
                f" ce={ls['cross_entropy']:.4f} box={ls['loss_box']:.4f}"
                f" | RPN recall@0.5 {r:.2f}"
                f" mAP@0.5 {ap:.3f}"
                f" (per-gt best IoU {np.round(best, 2)}"
                f" 3d {np.round(best3d, 2)})"
            )
    print("\ndone")


if __name__ == "__main__":
    main()
