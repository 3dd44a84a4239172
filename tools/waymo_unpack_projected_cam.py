#!/usr/bin/env python
"""Standalone Waymo ETL variant: projected_cam.

The reference ships three standalone unpackers alongside the combined one
(ref tools/waymo_unpack_projected_cam.py); this is the same production surface on the
shared machinery in waymo_unpack_combined.py (variant="projected_cam").  Offline
tool — requires tensorflow + waymo-open-dataset like the reference's.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from waymo_unpack_combined import main

if __name__ == "__main__":
    main(variant="projected_cam")
