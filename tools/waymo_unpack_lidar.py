#!/usr/bin/env python
"""Standalone Waymo ETL variant: lidar.

The reference ships three standalone unpackers alongside the combined one
(ref tools/waymo_unpack_lidar.py); this is the same production surface on the
shared machinery in waymo_unpack_combined.py (variant="lidar").  Offline
tool — requires tensorflow + waymo-open-dataset like the reference's.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from waymo_unpack_combined import main

if __name__ == "__main__":
    main(variant="lidar")
