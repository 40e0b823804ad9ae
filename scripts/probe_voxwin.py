#!/usr/bin/env python
"""Probe hybrid-step variants in ONE clean-exit TPU session:
  * WINDOW_FACTOR 2.0 (baseline) / 1.25 / 1.0
  * SORTED_R3_MIN 4096 (baseline) vs 512 (R=8 stage through sorted kernels)
Prints ms/step for each config; each config recompiles (~60 s over the
tunnel)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

float(jnp.sum(jnp.ones((8, 8))))
print("[probe] device:", jax.devices()[0], flush=True)

import pcfm.nn.pvconv as pvc
import pcfm.ops.pallas.voxel_sorted as pvs
from pcfm.config import Config
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step

BUDGET = float(os.environ.get("PROBE_BUDGET_S", 560))
T0 = time.perf_counter()


def time_step(tag):
    b, n = 8, 20000
    cfg = Config(pf_backbone="hybrid", latent_dim=128, has_rgb=True,
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
    for i in range(15):
        state, m = step(state, batch, rngs[4 + i], c_on, d_p)
    float(m["loss"])
    ms = (time.perf_counter() - t0) / 15 * 1e3
    print(f"[probe] {tag}: {ms:.1f} ms/step", flush=True)
    return ms


def left():
    return BUDGET - (time.perf_counter() - T0)


pass  # baseline known: 105.2
for wf in (1.0, 0.75):
    if left() < 150:
        print("[probe] budget out", flush=True)
        sys.exit(0)
    pvs.WINDOW_FACTOR = wf
    time_step(f"wf={wf}")
best = float(os.environ.get("BEST_WF", 1.0))
pvs.WINDOW_FACTOR = best
if left() > 150:
    pvc.SORTED_R3_MIN = 512
    time_step(f"wf={best} r3min=512 (R=8 sorted)")
