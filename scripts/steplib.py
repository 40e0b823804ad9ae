"""Shared TPU-probe harness: the 20k train-step timing loop that every
probe/bench script was repeating (axon discipline: claim first, sync via
host readback, clean exit)."""
import sys
import time

import jax
import jax.numpy as jnp

from pcfm.config import Config
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step


def claim_device():
    float(jnp.sum(jnp.ones((8, 8))))
    dev = jax.devices()[0]
    print(f"[steplib] device: {dev}", flush=True)
    return dev


def headline_cfg(backbone: str, n: int = 20000, b: int = 8, **kw) -> Config:
    """The reference README workload config (BASELINE.md)."""
    base = dict(pf_backbone=backbone, latent_dim=128, has_rgb=True,
                cond_dim=1, pointflow_rgb=True, use_rgb_in_latent=True,
                amp=True, use_bf16=True, tr_max_sample_points=n,
                batch_size=b, warmup_steps=0)
    base.update(kw)
    return Config(**base)


def time_train_step(cfg: Config, iters: int = 15, warmup: int = 4,
                    tag: str = "", make_step=None) -> float:
    """Compile + time one jitted train step; returns ms/step."""
    b, n = cfg.batch_size, cfg.tr_max_sample_points
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 1000)
    step = (make_step(bundle, tx) if make_step
            else make_train_step(bundle, tx, donate=True))
    key = jax.random.PRNGKey(1)
    batch = {"pts": jax.random.normal(key, (b, n, 3), jnp.float32),
             "rgb": jax.random.uniform(key, (b, n, 3), jnp.float32)}
    if cfg.cond_dim:
        batch["cond"] = jax.random.normal(key, (b, cfg.cond_dim),
                                          jnp.float32)
    batch = jax.device_put(batch)
    c_on, d_p = jnp.float32(1.0), jnp.float32(0.1)
    rngs = [jax.random.fold_in(key, i) for i in range(warmup + iters)]
    for i in range(warmup):
        state, m = step(state, batch, rngs[i], c_on, d_p)
    # block_until_ready is unreliable over the axon tunnel; host readback
    # forces the dependent chain
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, rngs[warmup + i], c_on, d_p)
    float(m["loss"])
    ms = (time.perf_counter() - t0) / iters * 1e3
    if tag:
        print(f"[steplib] {tag}: {ms:.1f} ms/step", flush=True)
    return ms
