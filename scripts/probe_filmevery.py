#!/usr/bin/env python
"""Turbo-trunk probe (Config pf_film_every, ROADMAP #19): step time at
the headline 20k workload for film_every 1 (reference parity) vs 2, both
backbones, then a quality A/B — two identical 200-epoch synthetic CLI
runs differing only in pf_film_every, compared on the offline eval.

One clean-exiting TPU session."""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from steplib import claim_device, headline_cfg, time_train_step

claim_device()
result = {}

for backbone in ("mlp", "hybrid"):
    for k in (1, 2):
        ms = time_train_step(headline_cfg(backbone, pf_film_every=k),
                             iters=15 if backbone == "mlp" else 8,
                             warmup=4, tag=f"{backbone}/film_every={k}")
        result[f"{backbone}_film{k}_ms"] = round(ms, 2)

QUALITY = os.environ.get("QUALITY", "1") == "1"
if QUALITY:
    from pcfm.eval.cli import main as eval_main
    from pcfm.train.cli import main as train_main
    for k in (1, 2):
        out = f"/tmp/pcfm_filmevery_{k}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        train_main([
            "--dataset_type", "synthetic", "--epochs", "200",
            "--save_every", "100", "--batch_size", "16",
            "--tr_max_sample_points", "2048", "--te_max_sample_points",
            "2048", "--latent_dim", "64", "--enc_width", "64",
            "--pf_width", "512", "--pf_depth", "6", "--pf_emb_dim", "256",
            "--lf_width", "256", "--lf_depth", "4", "--lf_emb_dim", "64",
            "--warmup_steps", "100", "--sample_steps", "25",
            "--geom_warmup_epochs", "30", "--cfg_drop_warmup_epochs",
            "50", "--pf_film_every", str(k), "--out_dir", out,
            "--vis_count", "0", "--num_workers", "2", "--seed", "11",
        ])
        result[f"quality_film{k}_train_s"] = round(time.perf_counter() - t0,
                                                   1)
        ev = eval_main(["--out_dir", out, "--mode", "both",
                        "--emd_max_points", "1024"])
        result[f"quality_film{k}_eval"] = {
            m: round(float(ev[m]), 4) for m in
            ("recon_cd", "recon_emd", "gen_cd") if m in ev}

print("[filmevery] " + json.dumps(result), flush=True)
with open("/tmp/filmevery_result.json", "w") as f:
    json.dump(result, f, indent=1)
