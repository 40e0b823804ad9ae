#!/usr/bin/env python
"""Generate posed colored point clouds from PartNet-Mobility URDFs
(requires pybullet + trimesh; see pcfm/datagen)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pcfm.datagen.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
