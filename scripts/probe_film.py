#!/usr/bin/env python
"""Probe: fused film_block kernel on TPU — microbench + full steps."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BUDGET = float(os.environ.get("PROBE_BUDGET_S", 540))
float(jnp.sum(jnp.ones((8, 8))))
print("[film] device claimed", flush=True)
T0 = time.perf_counter()
RESULTS = {}


def left():
    return BUDGET - (time.perf_counter() - T0)


def record(name, val):
    RESULTS[name] = val
    print(f"{name}: {val}", flush=True)
    with open("/tmp/pcfm_film.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def timeit(name, f, *a, iters=10, need=40):
    if left() < need:
        record(name, "SKIP")
        return None
    try:
        o = f(*a)
        o = o[0] if isinstance(o, (tuple, list)) else o
        float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        o = o[0] if isinstance(o, (tuple, list)) else o
        float(jnp.sum(o.astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / iters * 1e3
        record(name, round(ms, 3))
        return ms
    except Exception as e:
        record(name, f"FAIL {type(e).__name__}: {str(e)[:160]}")
        return None


def main():
    from pcfm.ops.pallas.film_block import film_block, film_block_reference
    key = jax.random.PRNGKey(0)
    b, n, c = 8, 20000, 512
    ks = jax.random.split(key, 7)
    h = (jax.random.normal(ks[0], (b, n, c)) * 0.5).astype(jnp.bfloat16)
    s = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    t = 0.1 * jax.random.normal(ks[2], (c,))
    gamma = 0.2 * jax.random.normal(ks[3], (b, c))
    beta = 0.2 * jax.random.normal(ks[4], (b, c))
    w = jax.random.normal(ks[5], (c, c)) / jnp.sqrt(1.0 * c)
    bias = 0.1 * jax.random.normal(ks[6], (c,))
    args = (h, s, t, gamma, beta, w, bias)

    fwd = jax.jit(lambda *a: film_block(*a, False))
    fwd_ref = jax.jit(film_block_reference)
    timeit("fwd_fused", fwd, *args)
    timeit("fwd_xla", fwd_ref, *args)

    # correctness on-device
    try:
        yk = fwd(*args)
        yr = fwd_ref(*args)
        err = float(jnp.max(jnp.abs(yk.astype(jnp.float32)
                                    - yr.astype(jnp.float32))))
        record("fwd_max_abs_err", round(err, 5))
    except Exception as e:
        record("fwd_max_abs_err", f"FAIL {str(e)[:120]}")

    def loss_fused(*a):
        return jnp.sum(film_block(*a, False).astype(jnp.float32) ** 2)

    def loss_ref(*a):
        return jnp.sum(film_block_reference(*a).astype(jnp.float32) ** 2)

    g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 5)))
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 5)))
    timeit("fwdbwd_fused", g_fused, *args)
    timeit("fwdbwd_xla", g_ref, *args)
    try:
        gk = g_fused(*args)
        gr = g_ref(*args)
        err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                        - b2.astype(jnp.float32))))
                  for a, b2 in zip(gk, gr))
        record("bwd_max_abs_err", round(err, 5))
    except Exception as e:
        record("bwd_max_abs_err", f"FAIL {str(e)[:120]}")

    # full train steps
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from profile_r2 import make_step
    for tag, backbone in [("mlp_fused_step_ms", "mlp"),
                          ("hybrid_fused_step_ms", "hybrid")]:
        if left() < 150:
            record(tag, "SKIP")
            continue
        step, state, batch, key2 = make_step(backbone)
        c_on, d_p = jnp.float32(1.0), jnp.float32(0.1)
        rngs = [jax.random.fold_in(key2, i) for i in range(18)]
        for i in range(4):
            state, m = step(state, batch, rngs[i], c_on, d_p)
        float(m["loss"])
        t0 = time.perf_counter()
        iters = 12 if backbone == "mlp" else 8
        for i in range(iters):
            state, m = step(state, batch, rngs[4 + i], c_on, d_p)
        float(m["loss"])
        record(tag, round((time.perf_counter() - t0) / iters * 1e3, 2))
    print("[film] done", flush=True)


if __name__ == "__main__":
    main()
