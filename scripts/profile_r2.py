#!/usr/bin/env python
"""Round-2 profiling session: hybrid (sorted backend) + mlp train steps,
with jax.profiler traces for trace_summary.py.  Single clean-exiting
process with an internal budget (CLAUDE.md TPU quirks)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BUDGET = float(os.environ.get("PROFILE_BUDGET_S", 600))
float(jnp.sum(jnp.ones((8, 8))))
print("[r2] device claimed", flush=True)
T0 = time.perf_counter()
RESULTS = {}


def left():
    return BUDGET - (time.perf_counter() - T0)


def record(name, val):
    RESULTS[name] = val
    print(f"{name}: {val}", flush=True)
    with open("/tmp/pcfm_r2.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def make_step(backbone, **over):
    from pcfm.config import Config
    from pcfm.train.state import init_state
    from pcfm.train.step import make_train_step
    b, n = 8, 20000
    cfg = Config(pf_backbone=backbone, latent_dim=128, has_rgb=True,
                 cond_dim=1, pointflow_rgb=True, use_rgb_in_latent=True,
                 amp=True, use_bf16=True, tr_max_sample_points=n,
                 batch_size=b, warmup_steps=0, **over)
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 29300)
    step = make_train_step(bundle, tx, donate=True)
    key = jax.random.PRNGKey(1)
    batch = {"pts": jax.random.normal(key, (b, n, 3), jnp.float32),
             "rgb": jax.random.uniform(key, (b, n, 3), jnp.float32),
             "cond": jax.random.normal(key, (b, 1), jnp.float32)}
    batch = jax.device_put(batch)
    return step, state, batch, key


def bench_and_trace(tag, backbone, iters, trace_dir, **over):
    if left() < 120:
        record(tag, "SKIP")
        return
    step, state, batch, key = make_step(backbone, **over)
    c_on, d_p = jnp.float32(1.0), jnp.float32(0.1)
    rngs = [jax.random.fold_in(key, i) for i in range(iters + 8)]
    for i in range(5):
        state, m = step(state, batch, rngs[i], c_on, d_p)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, rngs[5 + i], c_on, d_p)
    float(m["loss"])
    record(tag, round((time.perf_counter() - t0) / iters * 1e3, 2))
    # trace 3 steps
    with jax.profiler.trace(trace_dir):
        for i in range(3):
            state, m = step(state, batch, rngs[iters + 5 + i], c_on, d_p)
        float(m["loss"])
    record(tag + "_trace", trace_dir)


def main():
    only = os.environ.get("PROFILE_ONLY", "")
    if only:
        for spec in only.split(","):
            tag, backbone, iters, tdir = spec.split(":")
            bench_and_trace(tag, backbone, int(iters), tdir)
        print("[r2] done", flush=True)
        return
    bench_and_trace("hybrid_sorted_ms", "hybrid", 10, "/tmp/trace_hyb")
    bench_and_trace("mlp_ms", "mlp", 20, "/tmp/trace_mlp")
    # hybrid with xla backend for reference
    if left() > 150:
        step, state, batch, key = make_step("hybrid", voxel_backend="xla")
        c_on, d_p = jnp.float32(1.0), jnp.float32(0.1)
        rngs = [jax.random.fold_in(key, 100 + i) for i in range(13)]
        for i in range(3):
            state, m = step(state, batch, rngs[i], c_on, d_p)
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(8):
            state, m = step(state, batch, rngs[3 + i], c_on, d_p)
        float(m["loss"])
        record("hybrid_xla_ms", round((time.perf_counter() - t0) / 8 * 1e3,
                                      2))
    print("[r2] done", flush=True)


if __name__ == "__main__":
    main()
