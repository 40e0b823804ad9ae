#!/usr/bin/env python
"""Trace the mlp and hybrid train steps (one clean-exit TPU session).

Writes jax.profiler traces to /tmp/pcfm_trace_{mlp,hybrid}; summarize
offline with scripts/trace_summary.py (TF-free)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

float(jnp.sum(jnp.ones((8, 8))))
print("[trace] device:", jax.devices()[0], flush=True)

from pcfm.config import Config
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step

WHICH = os.environ.get("WHICH", "mlp,hybrid").split(",")


def run(backbone: str):
    b, n = 8, 20000
    cfg = Config(pf_backbone=backbone, latent_dim=128, has_rgb=True,
                 cond_dim=1, pointflow_rgb=True, use_rgb_in_latent=True,
                 amp=True, use_bf16=True, tr_max_sample_points=n,
                 batch_size=b, warmup_steps=0)
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 1000)
    step = make_train_step(bundle, tx, donate=True)
    key = jax.random.PRNGKey(1)
    batch = {"pts": jax.random.normal(key, (b, n, 3), jnp.float32),
             "rgb": jax.random.uniform(key, (b, n, 3), jnp.float32),
             "cond": jax.random.normal(key, (b, 1), jnp.float32)}
    batch = jax.device_put(batch)
    c_on, d_p = jnp.float32(1.0), jnp.float32(0.1)
    rngs = [jax.random.fold_in(key, i) for i in range(40)]
    for i in range(5):
        state, m = step(state, batch, rngs[i], c_on, d_p)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(10):
        state, m = step(state, batch, rngs[5 + i], c_on, d_p)
    float(m["loss"])
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"[trace] {backbone}: {ms:.2f} ms/step", flush=True)
    tdir = f"/tmp/pcfm_trace_{backbone}"
    with jax.profiler.trace(tdir):
        for i in range(3):
            state, m = step(state, batch, rngs[20 + i], c_on, d_p)
        float(m["loss"])
    print(f"[trace] {backbone} trace -> {tdir}", flush=True)


for w in WHICH:
    run(w.strip())
