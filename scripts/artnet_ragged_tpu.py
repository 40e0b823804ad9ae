#!/usr/bin/env python
"""RAGGED multi-category hardware rehearsal (r5, VERDICT #5): the
reference's headline workload mixes PartNet-Mobility categories with
DIFFERENT joint counts, which is where the cond-dim mode/max policy, the
NaN-motor padding, and the outlier report actually bite
(reference datasets.py:482-542).  No real PartNet mount exists in this
env, so the testable core is rehearsed end to end on datagen-authored
categories with ragged joint counts:

  1. author THREE categories with ragged joint counts
     (Scissors 1 / Laptop 1 / StorageFurniture 2) via
     scripts/make_articulated_assets.py
  2. datagen CLI -> posed colored clouds; PLY -> ONE mixed H5 shard set
     (motors NaN-padded to the shard max, pcfm/data/pack_h5.py)
  3. policy exercise on the mixed set: cond policy "mode" must pick
     canon_dim=1 over the ragged {1: 2/3, 2: 1/3} distribution and REPORT
     the 2-joint rows as outliers; "max" must pick canon_dim=2 with zero
     outliers and NaN-pad the 1-joint rows
  4. hybrid training through the real train CLI on the chip under the
     "max" policy (NaN-padded motors -> 0.0 cond entries flow through the
     jitted step) with the outlier report flag wired
  5. eval CLI recon + generative suite on the mixed test split

One clean-exiting TPU session; summary JSON to OUT/summary.json and the
repo record to docs/artnet_ragged.json.  Env knobs: PER_CAT (6),
STEPS (6), COMBOS (6), EPOCHS (300), NPTS (2048).

COMBOS defaults to 6 == STEPS deliberately: random_combinations caps at
the pose-grid size (datagen/core.py:91), so a 1-joint object can yield
at most STEPS poses while a 2-joint object would fill a larger request
from its STEPS^2 grid — COMBOS > STEPS would hand the single 2-joint
category MORE rows than the two 1-joint categories combined and flip
the mode policy's majority (measured on hardware: COMBOS=12 gave
51 dim-1 vs 57 dim-2 train rows and canon_dim=2 under "mode").  Equal
per-object pose counts keep the ragged distribution {1: 2/3, 2: 1/3}
the rehearsal is asserting about.
"""
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# SMOKE=1: CPU plumbing check of stages 1-3 (assets -> datagen -> pack ->
# policy exercise) without claiming the chip or training
SMOKE = bool(os.environ.get("SMOKE"))
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

float(jnp.sum(jnp.ones((8, 8))))
print("[ragged] device claimed:", jax.devices()[0], flush=True)

ROOT = os.environ.get("OUT", "/tmp/pcfm_artnet_ragged")
CATS = os.environ.get("CATS", "Scissors,Laptop,StorageFurniture")
PER_CAT = os.environ.get("PER_CAT", "6")
STEPS = os.environ.get("STEPS", "6")
COMBOS = os.environ.get("COMBOS", "6")
EPOCHS = int(os.environ.get("EPOCHS", 300))
NPTS = int(os.environ.get("NPTS", 2048))
BATCH = os.environ.get("BATCH", "16")
SCRIPTS = os.path.dirname(os.path.abspath(__file__))
DOCS = os.path.join(SCRIPTS, "..", "docs")

shutil.rmtree(ROOT, ignore_errors=True)
os.makedirs(ROOT)
t_all = time.time()

# ---- 1+2. ragged-category assets + datagen (CPU subprocesses keep the
# multiprocess fan-out off the TPU-holding process) ----
assets = os.path.join(ROOT, "assets")
poses = os.path.join(ROOT, "poses")
env = {**os.environ, "JAX_PLATFORMS": "cpu"}
subprocess.run([sys.executable, os.path.join(SCRIPTS,
                "make_articulated_assets.py"), "--out", assets,
                "--per-cat", PER_CAT, "--cats", CATS, "--seed", "11"],
               check=True, env=env)
subprocess.run([sys.executable, os.path.join(SCRIPTS, "make_dataset.py"),
                "--index", os.path.join(assets, "index.csv"),
                "--dataset-dir", assets, "--out-dir", poses,
                "--joint-types", "revolute,prismatic",
                "--steps", STEPS, "--num-combos", COMBOS,
                "--points", str(2 * NPTS), "--seed", "11", "--no-glb",
                "--workers", "8"], check=True, env=env)
n_poses = sum(1 for _, _, files in os.walk(poses)
              if "pointcloud.ply" in files)
print(f"[ragged] datagen: {n_poses} poses over {CATS} "
      f"({time.time() - t_all:.0f}s)", flush=True)

# ---- 3. ONE mixed H5 set + the policy exercise ----
from pcfm.data.pack_h5 import pack_ply_to_h5
from pcfm.data.h5_dataset import PartNetH5Dataset

h5dir = os.path.join(ROOT, "h5")
pack_ply_to_h5(poses, h5dir, split="train", n_points=2 * NPTS,
               shard_size=64, val_fraction=0.25, seed=0, verbose=False)

policy_log = {}
for policy in ("mode", "max"):
    rep = os.path.join(ROOT, f"outliers_{policy}.json")
    ds = PartNetH5Dataset(h5dir, split="train", tr_sample_size=NPTS,
                          te_sample_size=NPTS,
                          cond_dim_policy=policy, report_file=rep,
                          verbose=True)
    policy_log[policy] = {
        "canon_dim": int(ds.cond_dim),
        "n_rows": len(ds),
        "n_outliers": len(ds.outliers),
        "outlier_eff_dims": sorted({o["eff_dim"] for o in ds.outliers}),
        "report_file_written": os.path.isfile(rep)}
    print(f"[ragged] policy={policy}: {policy_log[policy]}", flush=True)

# the rehearsal's point: the ragged distribution must actually bite.
# outliers = rows whose eff_dim != canon_dim (reported, not dropped unless
# exclude_outliers): under "mode" the 2-joint rows are flagged; under
# "max" the 1-joint rows are flagged AND NaN-padded to canon_dim=2.
assert policy_log["mode"]["canon_dim"] == 1, policy_log
assert policy_log["max"]["canon_dim"] == 2, policy_log
assert policy_log["mode"]["outlier_eff_dims"] == [2], policy_log
assert policy_log["max"]["outlier_eff_dims"] == [1], policy_log
assert policy_log["mode"]["n_rows"] == policy_log["max"]["n_rows"], \
    policy_log   # reporting never drops rows without exclude_outliers

if SMOKE:
    print(f"[ragged] SMOKE OK ({time.time() - t_all:.0f}s): "
          f"{json.dumps(policy_log)}", flush=True)
    sys.exit(0)

# ---- 4. hybrid training on the chip under the max policy ----
from pcfm.train.cli import main as train_main

out = os.path.join(ROOT, "run")
t0 = time.perf_counter()
res = train_main([
    "--dataset_type", "partnet_h5", "--data_dir", h5dir,
    "--partnet_cond_policy", "max",
    "--partnet_report_file_train", os.path.join(out, "train_outliers.json"),
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
print(f"[ragged] {EPOCHS} epochs in {train_s:.0f}s: "
      f"{json.dumps({k: round(float(v), 4) for k, v in res.items()})}",
      flush=True)

# ---- 5. eval CLIs: recon + suite on the mixed test split ----
from pcfm.eval.cli import main as eval_main

ev = eval_main(["--out_dir", out, "--mode", "both",
                "--emd_max_points", "2048"])
suite = eval_main(["--out_dir", out, "--mode", "suite"])

summary = {"categories": CATS, "poses": n_poses, "epochs": EPOCHS,
           "n_points": NPTS, "train_seconds": round(train_s, 1),
           "policy_exercise": policy_log,
           "final": {k: round(float(v), 4) for k, v in res.items()},
           "eval": ev, "suite": suite}
with open(os.path.join(ROOT, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
with open(os.path.join(DOCS, "artnet_ragged.json"), "w") as f:
    json.dump(summary, f, indent=1)
print(f"[ragged] DONE ({time.time() - t_all:.0f}s): "
      f"{json.dumps(summary)[:500]}", flush=True)
