#!/usr/bin/env python
"""Batched round-2 measurements in ONE clean-exit TPU session:
  1. hybrid 20k step (current code: stage caches + winning WINDOW_FACTOR)
  2. mlp 20k step + sampler
  3. streamed EMD at 20k x 20k, chunk sweep (ROADMAP #4)
Appends JSON to /tmp/pcfm_bench_r2.json."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

float(jnp.sum(jnp.ones((8, 8))))
print("[r2] device:", jax.devices()[0], flush=True)

from pcfm.config import Config
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step

RES = {}
T0 = time.perf_counter()
BUDGET = float(os.environ.get("BUDGET_S", 560))


def rec(k, v):
    RES[k] = round(v, 3)
    print(f"[r2] {k}: {v:.3f}", flush=True)
    with open("/tmp/pcfm_bench_r2.json", "w") as f:
        json.dump(RES, f, indent=1)


def left():
    return BUDGET - (time.perf_counter() - T0)


def time_step(backbone, iters=15):
    b, n = 8, 20000
    cfg = Config(pf_backbone=backbone, latent_dim=128, has_rgb=True,
                 cond_dim=1, pointflow_rgb=True, use_rgb_in_latent=True,
                 amp=True, use_bf16=True, tr_max_sample_points=n,
                 batch_size=b, warmup_steps=0)
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 1000)
    step = make_train_step(bundle, tx, donate=True)
    key = jax.random.PRNGKey(1)
    batch = jax.device_put(
        {"pts": jax.random.normal(key, (b, n, 3), jnp.float32),
         "rgb": jax.random.uniform(key, (b, n, 3), jnp.float32),
         "cond": jax.random.normal(key, (b, 1), jnp.float32)})
    c_on, d_p = jnp.float32(1.0), jnp.float32(0.1)
    rngs = [jax.random.fold_in(key, i) for i in range(40)]
    for i in range(4):
        state, m = step(state, batch, rngs[i], c_on, d_p)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, rngs[4 + i], c_on, d_p)
    float(m["loss"])
    return (time.perf_counter() - t0) / iters * 1e3


rec("hybrid_ms_per_step", time_step("hybrid"))
if left() > 200:
    rec("mlp_ms_per_step", time_step("mlp", iters=30))

if left() > 120:
    from pcfm.ops.emd import earth_mover_distance_streamed
    key = jax.random.PRNGKey(2)
    a = jax.random.normal(key, (2, 20000, 3), jnp.float32)
    bb = jax.random.normal(jax.random.fold_in(key, 1), (2, 20000, 3),
                           jnp.float32)
    a, bb = jax.device_put(a), jax.device_put(bb)
    for chunk in (1000, 2000, 4000):
        if left() < 90:
            break
        f = jax.jit(lambda x, y, c=chunk:
                    earth_mover_distance_streamed(x, y, chunk=c))
        e = f(a, bb)
        float(jnp.sum(e))
        t0 = time.perf_counter()
        for _ in range(3):
            e = f(a, bb)
        float(jnp.sum(e))
        rec(f"emd20k_chunk{chunk}_s", (time.perf_counter() - t0) / 3)
print("[r2] done", flush=True)
