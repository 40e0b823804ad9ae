#!/usr/bin/env python
"""Time ONLY the hybrid 20k train step (clean-exit TPU session)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

float(jnp.sum(jnp.ones((8, 8))))
print("[probe] device:", jax.devices()[0], flush=True)

from pcfm.config import Config
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step

b, n = 8, 20000
cfg = Config(pf_backbone="hybrid", latent_dim=128, has_rgb=True,
             cond_dim=1, pointflow_rgb=True, use_rgb_in_latent=True,
             amp=True, use_bf16=True, tr_max_sample_points=n,
             batch_size=b, warmup_steps=0)
bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 1000)
step = make_train_step(bundle, tx, donate=True)
key = jax.random.PRNGKey(1)
batch = {"pts": jax.random.normal(key, (b, n, 3), jnp.float32),
         "rgb": jax.random.uniform(key, (b, n, 3), jnp.float32),
         "cond": jax.random.normal(key, (b, cfg.cond_dim), jnp.float32)}
batch = jax.device_put(batch)
c_on, d_p = jnp.float32(1.0), jnp.float32(0.1)
rngs = [jax.random.fold_in(key, i) for i in range(40)]
t0 = time.perf_counter()
for i in range(5):
    state, m = step(state, batch, rngs[i], c_on, d_p)
float(m["loss"])
print(f"[probe] warmup+compile: {time.perf_counter()-t0:.1f}s", flush=True)
iters = 20
t0 = time.perf_counter()
for i in range(iters):
    state, m = step(state, batch, rngs[5 + i], c_on, d_p)
float(m["loss"])
ms = (time.perf_counter() - t0) / iters * 1e3
print(f"[probe] hybrid 20k RGB: {ms:.1f} ms/step "
      f"({ms*293/1000:.1f} s/epoch)", flush=True)
