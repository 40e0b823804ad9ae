#!/usr/bin/env python
"""Pack make_dataset.py-style PLY trees into shard-*.h5 files (the packer
the reference README assumes but doesn't ship)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pcfm.data.pack_h5 import pack_ply_to_h5

if __name__ == "__main__":
    p = argparse.ArgumentParser("PLY -> H5 shard packer")
    p.add_argument("--in_dir", required=True,
                   help="tree of {model}/pose_*/pointcloud.ply")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--n_points", type=int, default=None)
    p.add_argument("--shard_size", type=int, default=128)
    p.add_argument("--val_fraction", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    pack_ply_to_h5(a.in_dir, a.out_dir, split=a.split, n_points=a.n_points,
                   shard_size=a.shard_size, val_fraction=a.val_fraction,
                   seed=a.seed)
