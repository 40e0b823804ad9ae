#!/usr/bin/env python
"""FULL-pipeline hardware run: synthetic colored PLY poses -> pack_h5
shards -> `partnet_h5` training via the real CLI (hybrid backbone) ->
sample + eval CLIs incl. the generative suite — the exact path a user of
the reference would follow, end to end on the chip.

One clean-exiting TPU session; writes docs-ready JSON to
/tmp/pcfm_pipeline/summary.json.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

float(jnp.sum(jnp.ones((8, 8))))
print("[pipe] device claimed:", jax.devices()[0], flush=True)

ROOT = "/tmp/pcfm_pipeline"
EPOCHS = int(os.environ.get("EPOCHS", 60))
NPTS = int(os.environ.get("NPTS", 2048))
shutil.rmtree(ROOT, ignore_errors=True)

# ---- 1. "datagen": synthetic articulated poses as colored PLYs ----
from pcfm.data.synthetic import hinge_shape
from pcfm.utils import save_point_cloud_ply_rgb

rng = np.random.RandomState(0)
n_models, n_poses = 8, 12
for mi in range(n_models):
    for pi in range(n_poses):
        d = os.path.join(ROOT, "raw", f"model_{mi}", f"pose_{pi:03d}")
        os.makedirs(d)
        angle = 0.2 + 1.2 * pi / n_poses
        xyz, rgb = hinge_shape(rng, 4096, angle)
        save_point_cloud_ply_rgb(xyz, rgb, os.path.join(d,
                                                        "pointcloud.ply"))
        with open(os.path.join(d, "angles.json"), "w") as f:
            json.dump({"angles": [angle]}, f)
print(f"[pipe] wrote {n_models * n_poses} PLY poses", flush=True)

# ---- 2. PLY -> H5 shards (train + val splits) ----
from pcfm.data.pack_h5 import pack_ply_to_h5

h5dir = os.path.join(ROOT, "h5")
pack_ply_to_h5(os.path.join(ROOT, "raw"), h5dir, split="train",
               n_points=4096, shard_size=16, val_fraction=0.15,
               verbose=False)
import glob
print(f"[pipe] shards: {sorted(os.path.basename(p) for p in glob.glob(h5dir + '/*/*.h5'))}",
      flush=True)

# ---- 3. hybrid training through the REAL CLI on the H5 data ----
from pcfm.train.cli import main as train_main

out = os.path.join(ROOT, "run")
t0 = time.perf_counter()
res = train_main([
    "--dataset_type", "partnet_h5", "--data_dir", h5dir,
    "--pf_backbone", "hybrid", "--epochs", str(EPOCHS),
    "--save_every", str(EPOCHS // 2), "--batch_size", "8",
    "--tr_max_sample_points", str(NPTS),
    "--te_max_sample_points", str(NPTS),
    "--latent_dim", "64", "--enc_width", "64", "--pf_width", "256",
    "--pf_depth", "4", "--pf_emb_dim", "64", "--lf_width", "128",
    "--lf_depth", "3", "--lf_emb_dim", "64", "--warmup_steps", "50",
    "--sample_steps", "16", "--geom_warmup_epochs", "8",
    "--cfg_drop_warmup_epochs", "16",
    "--ctx_stage_channels", "64", "128", "--ctx_stage_blocks", "2", "2",
    "--ctx_stage_res", "16", "8", "--ctx_dim", "32", "--ctx_emb_dim", "64",
    "--use_rgb_in_latent", "--pointflow_rgb", "--color_prior", "uniform",
    "--out_dir", out, "--vis_count", "2", "--num_workers", "2",
    "--keep_last_ckpts", "2", "--tensorboard",
])
train_s = time.perf_counter() - t0
print(f"[pipe] {EPOCHS} epochs in {train_s:.0f}s: "
      f"{json.dumps({k: round(float(v), 4) for k, v in res.items()})}",
      flush=True)

# ---- 4. sample + eval CLIs (incl. MMD/COV/1-NNA suite) ----
from pcfm.sample.cli import main as sample_main

sample_main(["--out_dir", out, "--num_samples", "4",
             "--n_points", str(NPTS), "--cond", "0.8"])
assert os.path.isfile(os.path.join(out, "generated", "sample_0.ply"))
print("[pipe] sample CLI OK", flush=True)

from pcfm.eval.cli import main as eval_main

ev = eval_main(["--out_dir", out, "--mode", "both",
                "--emd_max_points", "2048"])
suite = eval_main(["--out_dir", out, "--mode", "suite"])

summary = {"train_seconds": round(train_s, 1), "epochs": EPOCHS,
           "n_points": NPTS, "final": {k: round(float(v), 4)
                                       for k, v in res.items()},
           "eval": ev, "suite": suite}
with open(os.path.join(ROOT, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
print(f"[pipe] DONE: {json.dumps(summary)[:400]}", flush=True)
