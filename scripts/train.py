#!/usr/bin/env python
"""Train entry point.

Example (mirrors the reference README command shape):
  python scripts/train.py \
    --dataset_type partnet_h5 --data_dir /data/partnet/Scissors \
    --batch_size 8 --epochs 3000 --save_every 100 \
    --tr_max_sample_points 20000 --te_max_sample_points 20000 \
    --latent_dim 128 --partnet_cond_policy mode \
    --use_rgb_in_latent --pointflow_rgb --color_prior uniform \
    --out_dir runs/scissors_rgb
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pcfm.train.cli import main

if __name__ == "__main__":
    main()
