#!/usr/bin/env python
"""Trace the mlp and hybrid train steps (one clean-exit TPU session).

Writes jax.profiler traces to /tmp/pcfm_trace_{mlp,hybrid}; summarize
offline with scripts/trace_summary.py / trace_buckets.py (TF-free)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from steplib import claim_device, headline_cfg, time_train_step
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step

claim_device()

WHICH = os.environ.get("WHICH", "mlp,hybrid").split(",")


def run(backbone: str):
    cfg = headline_cfg(backbone)
    ms = time_train_step(cfg, iters=10, warmup=5, tag=backbone)
    # re-build to trace a fresh steady-state window
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 1000)
    step = make_train_step(bundle, tx, donate=True)
    b, n = cfg.batch_size, cfg.tr_max_sample_points
    key = jax.random.PRNGKey(1)
    batch = jax.device_put(
        {"pts": jax.random.normal(key, (b, n, 3), jnp.float32),
         "rgb": jax.random.uniform(key, (b, n, 3), jnp.float32),
         "cond": jax.random.normal(key, (b, 1), jnp.float32)})
    c_on, d_p = jnp.float32(1.0), jnp.float32(0.1)
    for i in range(5):
        state, m = step(state, batch, jax.random.fold_in(key, i), c_on,
                        d_p)
    float(m["loss"])
    tdir = f"/tmp/pcfm_trace_{backbone}"
    with jax.profiler.trace(tdir):
        for i in range(3):
            state, m = step(state, batch, jax.random.fold_in(key, 20 + i),
                            c_on, d_p)
        float(m["loss"])
    print(f"[trace] {backbone} trace -> {tdir}", flush=True)


for w in WHICH:
    run(w.strip())
