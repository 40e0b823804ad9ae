#!/usr/bin/env python
"""One-session probe: (1) hybrid step with the R=8 stage routed through
the sorted kernels (SORTED_R3_MIN 4096 -> 512); (2) 20k sampler wall-clock
at distilled NFE counts (euler x6 / x12 vs heun x50)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

float(jnp.sum(jnp.ones((8, 8))))
print("[r8] device:", jax.devices()[0], flush=True)

import pcfm.nn.pvconv as pvc
from pcfm.config import Config
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step
from pcfm.train.evaluate import make_sample_fn

b, n = 8, 20000
key = jax.random.PRNGKey(1)


def time_step(tag):
    cfg = Config(pf_backbone="hybrid", latent_dim=128, has_rgb=True,
                 cond_dim=1, pointflow_rgb=True, use_rgb_in_latent=True,
                 amp=True, use_bf16=True, tr_max_sample_points=n,
                 batch_size=b, warmup_steps=0)
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 1000)
    step = make_train_step(bundle, tx, donate=True)
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
    print(f"[r8] {tag}: {(time.perf_counter()-t0)/15*1e3:.1f} ms/step",
          flush=True)


pvc.SORTED_R3_MIN = 512
time_step("hybrid r3min=512 (R=8 sorted)")
pvc.SORTED_R3_MIN = 4096

# sampler wall-clock at distilled NFE (mlp backbone = the headline model)
cfg = Config(pf_backbone="mlp", latent_dim=128, has_rgb=True, cond_dim=1,
             pointflow_rgb=True, use_rgb_in_latent=True, amp=True,
             use_bf16=True, tr_max_sample_points=n, batch_size=b,
             warmup_steps=0)
for sampler, steps in (("heun", 50), ("euler", 12), ("euler", 6)):
    c = cfg.replace(sampler=sampler, sample_steps=steps)
    bundle, state, _ = init_state(c, jax.random.PRNGKey(0), 100)
    fn = make_sample_fn(bundle)
    x = fn(state, None, key, b, n)
    float(jnp.sum(x))
    t0 = time.perf_counter()
    for i in range(5):
        x = fn(state, None, jax.random.fold_in(key, i), b, n)
    float(jnp.sum(x))
    ms = (time.perf_counter() - t0) / 5 / b * 1e3
    print(f"[r8] sampler {sampler} x{steps}: {ms:.1f} ms/shape @20k",
          flush=True)
