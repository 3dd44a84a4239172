"""Render QUALITY_r4.json (tools/quality_run.py --emit) as markdown.

Prints one table per suite leg (mAP / proposal-recall / fp-taxonomy curve)
plus a one-line-per-leg summary table — paste-ready for STATUS.md, and a
quick human view of the driver artifact.

Usage: python tools/quality_summary.py [QUALITY_r4.json]
"""

from __future__ import annotations

import json
import sys


def _f(v, fmt="{:.3f}", dash="—"):
    """Format-or-dash: partial/old-schema artifacts render degraded rows
    instead of raising KeyError (ADVICE r4)."""
    return fmt.format(v) if isinstance(v, (int, float)) else dash


def leg_table(name: str, leg: dict) -> str:
    eval_d = leg.get("eval", {})
    lines = [
        f"### {name} — {leg.get('mode', '?')}/{leg.get('net', '?')}, "
        f"{leg.get('frames', '?')} frame(s), "
        f"lr {leg.get('lr', '?')}, "
        f"{'rotated' if leg.get('rotated_nms') else 'parity'}-NMS, "
        f"eval mAP@{eval_d.get('iou', '?')}({eval_d.get('type', '?')})",
        "",
        "| iter | loss | mAP | mAP(bev) | prop recall | tp | fp | dup/loc/bg |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for p in leg.get("curve", []):
        t = p.get("fp_taxonomy", {})
        lines.append(
            f"| {p.get('iter', '?')} | {_f(p.get('total_loss'))} | "
            f"{_f(p.get('map'))} | {_f(p.get('map_bev'))} | "
            f"{_f(p.get('proposal_recall'))} | {p.get('tp', '—')} | "
            f"{p.get('fp', '—')} | {t.get('duplicate', 0)}/"
            f"{t.get('localization', 0)}/{t.get('background', 0)} |"
        )
    uc = (leg.get("final") or {}).get("uc_stats")
    if uc:
        for key, s in uc.items():
            lines.append(
                f"\nuc[{key}]: tp_mean={_f(s.get('tp_mean'), '{:.4f}')} "
                f"fp_mean={_f(s.get('fp_mean'), '{:.4f}')} "
                f"AUC(fp>tp)={_f(s.get('auc_fp_ranked_higher'), '{:.3f}')}"
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
        summary.append(
            f"| {name} | {_f(fin.get('map'))} | {_f(fin.get('map_bev'))} | "
            f"{_f(fin.get('proposal_recall'))} | "
            f"{fin.get('iter', '—')} | {leg.get('wall_sec', 0):.0f}s |"
        )
    print("\n".join(summary))
    print()
    for name, leg in suite.items():
        if leg.get("curve"):
            print(leg_table(name, leg))
            print()


if __name__ == "__main__":
    main(*sys.argv[1:2])
