#!/usr/bin/env python
"""One-session TPU op profiler with an internal time budget.

The axon TPU tunnel wedges for ~10 min whenever a process is killed
mid-execution, so ALL measurements run in one process that watches its own
clock and always exits cleanly.  Results stream to stdout and to
/tmp/pcfm_profile.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BUDGET = float(os.environ.get("PROFILE_BUDGET_S", 420))
# claim the device BEFORE starting the budget clock — the axon tunnel can
# queue a claim for minutes
float(jnp.sum(jnp.ones((8, 8))))
print("[profile] device claimed", flush=True)
T0 = time.perf_counter()
RESULTS = {}


def left():
    return BUDGET - (time.perf_counter() - T0)


def record(name, ms):
    RESULTS[name] = ms
    print(f"{name}: {ms:.2f} ms", flush=True)
    with open("/tmp/pcfm_profile.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def timeit(name, f, *a, iters=5):
    if left() < 60:
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
    record(name, ms)
    return ms


def main():
    from pcfm.ops.voxel import (avg_voxelize, normalize_coords,
                                trilinear_devoxelize,
                                trilinear_devoxelize_windowed)
    key = jax.random.PRNGKey(0)
    b, n = 8, 20000
    pts = jax.random.normal(key, (b, n, 3))

    for r, c in [(32, 128), (16, 256), (8, 256)]:
        if left() < 90:
            break
        feats = jax.random.normal(key, (b, n, c))
        normc, voxc = jax.jit(
            lambda p, r=r: normalize_coords(p, r))(pts)
        grid = jax.jit(lambda f, v, r=r: avg_voxelize(f, v, r))(feats, voxc)

        timeit(f"vox_fb_r{r}_c{c}",
               jax.jit(jax.grad(
                   lambda f, r=r, voxc=voxc:
                   jnp.sum(avg_voxelize(f, voxc, r) ** 2))), feats)
        timeit(f"devox_fb_r{r}_c{c}",
               jax.jit(jax.grad(
                   lambda g, r=r, normc=normc:
                   jnp.sum(trilinear_devoxelize(g, normc, r) ** 2))), grid)
        timeit(f"devoxwin_fb_r{r}_c{c}",
               jax.jit(jax.grad(
                   lambda g, r=r, normc=normc:
                   jnp.sum(trilinear_devoxelize_windowed(g, normc, r) ** 2))),
               grid)

    # chamfer at 20k x 20k
    if left() > 120:
        from pcfm.ops.chamfer import chamfer_l2
        a = jax.random.normal(key, (8, 20000, 3))
        bb = jax.random.normal(jax.random.fold_in(key, 1), (8, 20000, 3))
        timeit("chamfer20k", jax.jit(chamfer_l2), a, bb, iters=3)

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
