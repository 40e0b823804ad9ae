#!/usr/bin/env python
"""Category-level hardware run on DATAGEN-PRODUCED articulated objects —
the reference's own data path (README.md:141-153 trains on a
PartNet-Mobility category), executed end to end with in-repo assets:

  1. author a parametric URDF+OBJ category tree
     (scripts/make_articulated_assets.py)
  2. datagen CLI -> posed colored point clouds (kinematic backend,
     reference make_dataset.py:423-575 semantics)
  3. PLY -> H5 shard packer
  4. hybrid training through the real train CLI on the H5 shards
  5. sample + eval CLIs: whole-split recon CD + MMD/COV/1-NNA suite

One clean-exiting TPU session; summary JSON to OUT/summary.json.
Env knobs: CAT (Scissors), PER_CAT (8), STEPS (24), EPOCHS (400).
"""
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

float(jnp.sum(jnp.ones((8, 8))))
print("[artnet] device claimed:", jax.devices()[0], flush=True)

ROOT = os.environ.get("OUT", "/tmp/pcfm_artnet")
CAT = os.environ.get("CAT", "Scissors")
PER_CAT = os.environ.get("PER_CAT", "8")
STEPS = os.environ.get("STEPS", "24")
EPOCHS = int(os.environ.get("EPOCHS", 400))
NPTS = int(os.environ.get("NPTS", 2048))
BATCH = os.environ.get("BATCH", "16")
SCRIPTS = os.path.dirname(os.path.abspath(__file__))

shutil.rmtree(ROOT, ignore_errors=True)
os.makedirs(ROOT)
t_all = time.time()

# ---- 1+2. assets + datagen CLI (separate CPU process: keeps the
# ProcessPoolExecutor fan-out off the TPU-holding process) ----
assets = os.path.join(ROOT, "assets")
poses = os.path.join(ROOT, "poses")
env = {**os.environ, "JAX_PLATFORMS": "cpu"}
subprocess.run([sys.executable, os.path.join(SCRIPTS,
                "make_articulated_assets.py"), "--out", assets,
                "--per-cat", PER_CAT, "--cats", CAT, "--seed", "0"],
               check=True, env=env)
subprocess.run([sys.executable, os.path.join(SCRIPTS, "make_dataset.py"),
                "--index", os.path.join(assets, "index.csv"),
                "--dataset-dir", assets, "--out-dir", poses,
                "--joint-types", "revolute,prismatic",
                "--steps", STEPS, "--num-combos", "40",
                "--points", str(2 * NPTS), "--seed", "0", "--no-glb",
                "--workers", "8"], check=True, env=env)
n_poses = sum(1 for _, _, files in os.walk(poses)
              if "pointcloud.ply" in files)
print(f"[artnet] datagen: {n_poses} poses ({time.time() - t_all:.0f}s)",
      flush=True)

# ---- 3. PLY -> H5 shards ----
from pcfm.data.pack_h5 import pack_ply_to_h5

h5dir = os.path.join(ROOT, "h5")
pack_ply_to_h5(poses, h5dir, split="train", n_points=2 * NPTS,
               shard_size=64, val_fraction=0.25, seed=0, verbose=False)

# ---- 4. hybrid training via the real CLI ----
from pcfm.train.cli import main as train_main

out = os.path.join(ROOT, "run")
t0 = time.perf_counter()
res = train_main([
    "--dataset_type", "partnet_h5", "--data_dir", h5dir,
    "--pf_backbone", "hybrid", "--epochs", str(EPOCHS),
    "--save_every", str(EPOCHS // 2), "--batch_size", BATCH,
    "--tr_max_sample_points", str(NPTS),
    "--te_max_sample_points", str(NPTS),
    "--latent_dim", "64", "--pf_width", "512", "--pf_depth", "5",
    "--warmup_steps", "200", "--sample_steps", "50",
    "--geom_warmup_epochs", "20", "--cfg_drop_warmup_epochs", "40",
    "--guidance_scale", "2.0",
    "--use_rgb_in_latent", "--pointflow_rgb", "--color_prior", "uniform",
    "--out_dir", out, "--vis_count", "4", "--num_workers", "2",
    "--keep_last_ckpts", "2",
])
train_s = time.perf_counter() - t0
print(f"[artnet] {EPOCHS} epochs in {train_s:.0f}s: "
      f"{json.dumps({k: round(float(v), 4) for k, v in res.items()})}",
      flush=True)

# ---- 5. sample + eval CLIs ----
from pcfm.sample.cli import main as sample_main

sample_main(["--out_dir", out, "--num_samples", "4",
             "--n_points", str(NPTS), "--cond", "0.6"])
print("[artnet] sample CLI OK", flush=True)

from pcfm.eval.cli import main as eval_main

ev = eval_main(["--out_dir", out, "--mode", "both",
                "--emd_max_points", "2048"])
suite = eval_main(["--out_dir", out, "--mode", "suite"])

summary = {"category": CAT, "poses": n_poses, "epochs": EPOCHS,
           "n_points": NPTS, "train_seconds": round(train_s, 1),
           "final": {k: round(float(v), 4) for k, v in res.items()},
           "eval": ev, "suite": suite}
with open(os.path.join(ROOT, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
print(f"[artnet] DONE ({time.time() - t_all:.0f}s): "
      f"{json.dumps(summary)[:500]}", flush=True)
