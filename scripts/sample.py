#!/usr/bin/env python
"""Generate point clouds from a trained checkpoint."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pcfm.sample.cli import main

if __name__ == "__main__":
    main()
