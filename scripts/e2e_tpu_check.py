#!/usr/bin/env python
"""End-to-end TPU verification: train the synthetic config via the real
CLI path, then sample + eval from the produced checkpoints, then re-bench
the hybrid step.  One clean-exiting session (axon discipline)."""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

float(jnp.sum(jnp.ones((8, 8))))
print("[e2e] device claimed:", jax.devices()[0], flush=True)

OUT = "/tmp/pcfm_e2e_run"
shutil.rmtree(OUT, ignore_errors=True)

from pcfm.train.cli import main as train_main

t0 = time.perf_counter()
res = train_main([
    "--dataset_type", "synthetic", "--epochs", "30", "--save_every", "10",
    "--batch_size", "8", "--tr_max_sample_points", "512",
    "--te_max_sample_points", "512", "--latent_dim", "32",
    "--enc_width", "32", "--pf_width", "128", "--pf_depth", "4",
    "--pf_emb_dim", "32", "--lf_width", "64", "--lf_depth", "3",
    "--lf_emb_dim", "32", "--warmup_steps", "20", "--sample_steps", "10",
    "--geom_warmup_epochs", "5", "--cfg_drop_warmup_epochs", "10",
    "--out_dir", OUT, "--vis_count", "2", "--num_workers", "2",
])
print(f"[e2e] train done in {time.perf_counter()-t0:.1f}s: "
      f"{json.dumps({k: round(v, 4) for k, v in res.items()})}", flush=True)
assert res["loss_point"] < 2.0, "point loss did not decrease"

from pcfm.sample.cli import main as sample_main
sample_main(["--out_dir", OUT, "--num_samples", "2", "--n_points", "256",
             "--sample_steps", "10"])
assert os.path.isfile(os.path.join(OUT, "generated", "sample_0.ply"))
print("[e2e] sample CLI OK", flush=True)

from pcfm.eval.cli import main as eval_main
ev = eval_main(["--out_dir", OUT, "--mode", "both", "--max_batches", "2",
                "--emd_max_points", "512"])
print("[e2e] eval CLI OK", flush=True)

# hybrid step re-bench with bf16 one-hot dense ops
from pcfm.config import Config
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step
key = jax.random.PRNGKey(0)
b, n = 8, 20000
cfg = Config(pf_backbone="hybrid", latent_dim=128, has_rgb=True, cond_dim=1,
             pointflow_rgb=True, use_rgb_in_latent=True, amp=True,
             use_bf16=True, warmup_steps=0)
bundle, state, tx = init_state(cfg, key, 1000)
step = make_train_step(bundle, tx, donate=True)
batch = {"pts": jax.random.normal(key, (b, n, 3)),
         "rgb": jax.random.uniform(key, (b, n, 3)),
         "cond": jax.random.normal(key, (b, 1))}
con, dpv = jnp.float32(1.0), jnp.float32(0.1)
state, m = step(state, batch, key, con, dpv)
float(m["loss"])
t0 = time.perf_counter()
for i in range(10):
    state, m = step(state, batch, jax.random.fold_in(key, i), con, dpv)
float(m["loss"])
print(f"[e2e] hybrid step (bf16 one-hots): "
      f"{(time.perf_counter()-t0)/10*1e3:.1f} ms", flush=True)
print("[e2e] ALL OK", flush=True)
