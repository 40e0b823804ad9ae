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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from steplib import claim_device, headline_cfg, time_train_step

claim_device()

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


rec("hybrid_ms_per_step", time_train_step(headline_cfg("hybrid")))
if left() > 200:
    rec("mlp_ms_per_step", time_train_step(headline_cfg("mlp"), iters=30))

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
