"""Render QUALITY_r4.json (tools/quality_run.py --emit) as markdown.

Prints one table per suite leg (mAP / proposal-recall / fp-taxonomy curve)
plus a one-line-per-leg summary table — paste-ready for STATUS.md, and a
quick human view of the driver artifact.

Usage: python tools/quality_summary.py [QUALITY_r4.json]
"""

from __future__ import annotations

import json
import sys


def leg_table(name: str, leg: dict) -> str:
    lines = [
        f"### {name} — {leg['mode']}/{leg['net']}, {leg['frames']} frame(s), "
        f"lr {leg['lr']}, {'rotated' if leg.get('rotated_nms') else 'parity'}-NMS, "
        f"eval mAP@{leg['eval']['iou']}({leg['eval']['type']})",
        "",
        "| iter | loss | mAP | mAP(bev) | prop recall | tp | fp | dup/loc/bg |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for p in leg.get("curve", []):
        t = p.get("fp_taxonomy", {})
        bev = f"{p['map_bev']:.3f}" if "map_bev" in p else "—"
        lines.append(
            f"| {p['iter']} | {p.get('total_loss', float('nan')):.3f} | "
            f"{p['map']:.3f} | {bev} | {p['proposal_recall']:.3f} | {p['tp']} | "
            f"{p['fp']} | {t.get('duplicate', 0)}/{t.get('localization', 0)}/"
            f"{t.get('background', 0)} |"
        )
    lines.append(f"\nwall: {leg.get('wall_sec', 0):.0f}s")
    return "\n".join(lines)


def main(path: str = "QUALITY_r4.json") -> None:
    with open(path) as f:
        suite = json.load(f)
    summary = [
        "| leg | final mAP | mAP(bev) | prop recall | iters | wall |",
        "|---|---|---|---|---|---|",
    ]
    for name, leg in suite.items():
        fin = leg.get("final")
        if not fin:
            summary.append(f"| {name} | (incomplete) | — | — | — | — |")
            continue
        bev = f"{fin['map_bev']:.3f}" if "map_bev" in fin else "—"
        summary.append(
            f"| {name} | {fin['map']:.3f} | {bev} | "
            f"{fin['proposal_recall']:.3f} | "
            f"{fin['iter']} | {leg.get('wall_sec', 0):.0f}s |"
        )
    print("\n".join(summary))
    print()
    for name, leg in suite.items():
        if leg.get("curve"):
            print(leg_table(name, leg))
            print()


if __name__ == "__main__":
    main(*sys.argv[1:2])
