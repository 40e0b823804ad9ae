#!/usr/bin/env python
"""One-session probe: (1) hybrid step with the R=8 stage routed through
the sorted kernels (SORTED_R3_MIN 4096 -> 512); (2) 20k sampler wall-clock
at distilled NFE counts (euler x6 / x12 vs heun x50).

Measured (r2): r3min=512 -> 112.2 ms vs 105.5 baseline (dense one-hot
stays right for R^3 <= 4096); heun x50 54.1 / euler x12 7.3 / euler x6
4.2 ms/shape at 20k."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from steplib import claim_device, headline_cfg, time_train_step

claim_device()

import pcfm.nn.pvconv as pvc
from pcfm.train.state import init_state
from pcfm.train.evaluate import make_sample_fn

pvc.SORTED_R3_MIN = 512
time_train_step(headline_cfg("hybrid"), tag="hybrid r3min=512 (R=8 sorted)")
pvc.SORTED_R3_MIN = 4096

b, n = 8, 20000
key = jax.random.PRNGKey(1)
for sampler, steps in (("heun", 50), ("euler", 12), ("euler", 6)):
    cfg = headline_cfg("mlp", sampler=sampler, sample_steps=steps)
    bundle, state, _ = init_state(cfg, jax.random.PRNGKey(0), 100)
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
