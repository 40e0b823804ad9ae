#!/usr/bin/env python
"""Second profiling session: dense one-hot voxel ops vs scatter/gather,
bf16 gather, and the hybrid train step after the dense dispatch."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BUDGET = float(os.environ.get("PROFILE_BUDGET_S", 420))
float(jnp.sum(jnp.ones((8, 8))))
print("[profile2] device claimed", flush=True)
T0 = time.perf_counter()
RESULTS = {}


def left():
    return BUDGET - (time.perf_counter() - T0)


def timeit(name, f, *a, iters=5, budget_need=60):
    if left() < budget_need:
        print(f"skip {name} (budget)", flush=True)
        return None
    o = f(*a)
    o = o[0] if isinstance(o, tuple) else o
    float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    o = o[0] if isinstance(o, tuple) else o
    float(jnp.sum(o.astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / iters * 1e3
    RESULTS[name] = ms
    print(f"{name}: {ms:.2f} ms", flush=True)
    with open("/tmp/pcfm_profile2.json", "w") as f2:
        json.dump(RESULTS, f2, indent=2)
    return ms


def main():
    from pcfm.ops.voxel import (avg_voxelize_dense, normalize_coords,
                                trilinear_devoxelize,
                                trilinear_devoxelize_dense)
    key = jax.random.PRNGKey(0)
    b, n = 8, 20000
    pts = jax.random.normal(key, (b, n, 3))

    P = jax.lax.Precision
    for r, c in [(16, 256), (8, 256)]:
        feats = jax.random.normal(key, (b, n, c))
        normc, voxc = jax.jit(lambda p, r=r: normalize_coords(p, r))(pts)
        grid = avg_voxelize_dense(feats, voxc, r)
        timeit(f"voxD_fb_r{r}",
               jax.jit(jax.grad(lambda f, r=r, voxc=voxc: jnp.sum(
                   avg_voxelize_dense(f, voxc, r) ** 2))), feats)
        timeit(f"devoxD_fb_r{r}",
               jax.jit(jax.grad(lambda g, r=r, normc=normc: jnp.sum(
                   trilinear_devoxelize_dense(g, normc, r) ** 2))), grid)
        timeit(f"devoxD_bf16_fb_r{r}",
               jax.jit(jax.grad(lambda g, r=r, normc=normc: jnp.sum(
                   trilinear_devoxelize_dense(
                       g, normc, r, precision=P.DEFAULT) ** 2))), grid)

    # R=32: bf16 row-gather variant of the corner devox
    r, c = 32, 128
    feats = jax.random.normal(key, (b, n, c))
    normc, voxc = jax.jit(lambda p: normalize_coords(p, 32))(pts)
    from pcfm.ops.voxel import avg_voxelize
    grid = jax.jit(lambda f, v: avg_voxelize(f, v, 32))(feats, voxc)

    def devox_bf16(g, nc):
        return trilinear_devoxelize(g.astype(jnp.bfloat16), nc, 32)

    timeit("devox_bf16_fb_r32",
           jax.jit(jax.grad(lambda g: jnp.sum(
               devox_bf16(g, normc).astype(jnp.float32) ** 2))), grid)

    # hybrid step after dense dispatch
    if left() > 150:
        from pcfm.config import Config
        from pcfm.train.state import init_state
        from pcfm.train.step import make_train_step
        cfg = Config(pf_backbone="hybrid", latent_dim=128, has_rgb=True,
                     cond_dim=1, pointflow_rgb=True, use_rgb_in_latent=True,
                     amp=True, use_bf16=True, warmup_steps=0)
        bundle, state, tx = init_state(cfg, key, 1000)
        step = make_train_step(bundle, tx, donate=True)
        batch = {"pts": pts, "rgb": jax.random.uniform(key, (b, n, 3)),
                 "cond": jax.random.normal(key, (b, 1))}
        con, dp = jnp.float32(1.0), jnp.float32(0.1)
        state, m = step(state, batch, key, con, dp)
        float(m["loss"])
        t0 = time.perf_counter()
        iters = 10
        for i in range(iters):
            state, m = step(state, batch, jax.random.fold_in(key, i), con,
                            dp)
        float(m["loss"])
        ms = (time.perf_counter() - t0) / iters * 1e3
        RESULTS["hybrid_step_dense"] = ms
        print(f"hybrid_step_dense: {ms:.1f} ms", flush=True)

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
