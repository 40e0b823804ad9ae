#!/usr/bin/env python
"""Evaluate CD / EMD / F-score of a trained model on its test split."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pcfm.eval.cli import main

if __name__ == "__main__":
    main()
