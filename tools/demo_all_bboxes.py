#!/usr/bin/env python
"""Demo drawing ALL classes' detections on one canvas, one color per class
(ref tools/demo_all_bboxes.py:53-124: tab10 color cycle, CONF_THRESH 0.8).

A thin variant of tools/demo.py: same flags, but the per-class draws use a
fixed color cycle keyed by class index instead of uncertainty coloring,
and the default threshold matches the reference's 0.8.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    import demo

    argv = list(sys.argv[1:] if argv is None else argv)
    # PREPEND the defaults: demo.py's --set is nargs=REMAINDER, so anything
    # appended after a user-supplied --set would be swallowed into set_cfgs
    prefix = ["--class_colors", "1"]
    if not any(a.startswith("--thresh") for a in argv):
        prefix += ["--thresh", "0.8"]  # ref demo_all_bboxes.py:69 CONF_THRESH
    if not any(a.startswith("--out") for a in argv):
        prefix += ["--out", "demo_all_bboxes_out.png"]
    demo.main(prefix + argv)


if __name__ == "__main__":
    main()
