#!/usr/bin/env python
"""Convergence demonstration on the synthetic articulated dataset + a
streamed-EMD 20k benchmark.  One clean TPU session; writes
docs/convergence.md with the learning curve."""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

float(jnp.sum(jnp.ones((8, 8))))
print("[demo] device claimed:", jax.devices()[0], flush=True)

OUT = "/tmp/pcfm_convergence"
shutil.rmtree(OUT, ignore_errors=True)

from pcfm.train.cli import main as train_main

t0 = time.perf_counter()
train_main([
    "--dataset_type", "synthetic", "--epochs", "150", "--save_every", "30",
    "--batch_size", "16", "--tr_max_sample_points", "1024",
    "--te_max_sample_points", "1024", "--latent_dim", "64",
    "--enc_width", "64", "--pf_width", "256", "--pf_depth", "5",
    "--pf_emb_dim", "64", "--lf_width", "128", "--lf_depth", "4",
    "--lf_emb_dim", "64", "--warmup_steps", "50", "--sample_steps", "25",
    "--geom_warmup_epochs", "30", "--cfg_drop_warmup_epochs", "50",
    "--out_dir", OUT, "--vis_count", "2", "--num_workers", "2",
])
train_s = time.perf_counter() - t0
print(f"[demo] 150 epochs in {train_s:.0f}s", flush=True)

# summarize the learning curve
rows = [json.loads(ln) for ln in open(os.path.join(OUT, "metrics.jsonl"))]
curve = [(r["epoch"], r["loss_point"], r["loss_latent"]) for r in rows
         if r["epoch"] % 15 == 0 or r["epoch"] in (1, 150)]

from pcfm.eval.cli import main as eval_main
ev = eval_main(["--out_dir", OUT, "--mode", "both", "--emd_max_points",
                "1024"])

# streamed EMD at 20k on TPU
from pcfm.ops.emd import earth_mover_distance_streamed
key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (2, 20000, 3))
b = jax.random.normal(jax.random.fold_in(key, 1), (2, 20000, 3))
e = earth_mover_distance_streamed(a, b, chunk=2000)
float(jnp.sum(e))
t0 = time.perf_counter()
e = earth_mover_distance_streamed(a, b, chunk=2000)
emd_vals = [round(float(v), 4) for v in e]
emd_s = time.perf_counter() - t0
print(f"[demo] streamed EMD 2x20k x 20k: {emd_s:.2f}s -> {emd_vals}",
      flush=True)

os.makedirs("docs", exist_ok=True)
with open("docs/convergence.md", "w") as f:
    f.write("# Convergence demonstration (synthetic articulated shapes)\n\n")
    f.write(f"150 epochs, batch 16, 1024 pts, RGB + 1-D joint condition, "
            f"mlp backbone, one TPU v5e chip — {train_s:.0f}s total "
            f"(incl. H2D over the dev tunnel).\n\n")
    f.write("| epoch | loss_point | loss_latent |\n|---|---|---|\n")
    for ep, lp, lz in curve:
        f.write(f"| {ep} | {lp:.4f} | {lz:.4f} |\n")
    f.write("\nFinal offline eval (Heun x25, EMA weights):\n\n```json\n")
    f.write(json.dumps(ev, indent=2))
    f.write("\n```\n\nStreamed full-cloud EMD at 20k x 20k points "
            f"(impossible for the reference CUDA kernel — 12.8 GB match "
            f"matrix): {emd_s:.2f} s for a 2-batch on one chip.\n")
print("[demo] wrote docs/convergence.md", flush=True)
