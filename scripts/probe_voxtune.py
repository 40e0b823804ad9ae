#!/usr/bin/env python
"""Probe: sorted-window voxel kernel tuning — TR (rows per tile) and the
window safety factor.  Smaller tiles track the sorted-id span tighter, so
every one-hot window matmul shrinks; the n_pass loop keeps any overflow
correct."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BUDGET = float(os.environ.get("PROBE_BUDGET_S", 540))
float(jnp.sum(jnp.ones((8, 8))))
print("[voxtune] device claimed", flush=True)
T0 = time.perf_counter()
RESULTS = {}


def left():
    return BUDGET - (time.perf_counter() - T0)


def record(name, val):
    RESULTS[name] = val
    print(f"{name}: {val}", flush=True)
    with open("/tmp/pcfm_voxtune.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def timeit(name, f, *a, iters=8, need=45):
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
        record(name, f"FAIL {type(e).__name__}: {str(e)[:140]}")
        return None


def main():
    import pcfm.ops.pallas.voxel_sorted as vs
    import pcfm.ops.voxel_sorted as vos
    from pcfm.ops.voxel import normalize_coords, flatten_voxel_ids

    key = jax.random.PRNGKey(0)
    b, n = 8, 20000
    pts = jax.random.normal(key, (b, n, 3))

    def setup(r, c):
        normc, voxc = jax.jit(
            lambda p: normalize_coords(p, r))(pts)
        ids = flatten_voxel_ids(voxc, r)
        perm = jnp.argsort(ids, axis=1)
        ids_s = jnp.take_along_axis(ids, perm, axis=1)
        nc_s = jnp.take_along_axis(normc, perm[..., None], axis=1)
        feats = jax.random.normal(key, (b, n, c))
        grid = jax.random.normal(key, (b, r ** 3, c))
        return ids_s, nc_s, feats, grid

    def set_tr(tr):
        vs.TR = tr
        vs.TILE = tr * 128

    cases = [(32, 128), (16, 256)]
    for tr in (2, 4):
        set_tr(tr)
        for r, c in cases:
            ids_s, nc_s, feats, grid = setup(r, c)
            tag = f"tr{tr}_r{r}c{c}"
            devox_fb = jax.jit(jax.grad(
                lambda g, nc, r=r: jnp.sum(
                    vos.trilinear_devoxelize_sorted(g, nc, r) ** 2)))
            timeit(f"devox_fb_{tag}", devox_fb, grid, nc_s)
            vox_fb = jax.jit(jax.grad(
                lambda f, i, r=r: jnp.sum(
                    vos.avg_voxelize_sorted(f, i, r) ** 2)))
            timeit(f"vox_fb_{tag}", vox_fb, feats, ids_s)
    set_tr(2)

    # correctness spot-check TR=1 vs TR=2 on one case
    set_tr(1)
    ids_s, nc_s, feats, grid = setup(32, 128)
    o1 = jax.jit(lambda g, nc: vos.trilinear_devoxelize_sorted(
        g, nc, 32))(grid, nc_s)
    set_tr(2)
    o2 = jax.jit(lambda g, nc: vos.trilinear_devoxelize_sorted(
        g, nc, 32))(grid, nc_s)
    record("tr1_vs_tr2_max_err",
           round(float(jnp.max(jnp.abs(o1 - o2))), 6))

    # full hybrid step at best TR
    sys.path.insert(0, os.path.dirname(__file__))
    from profile_r2 import make_step
    for tr in (2,):
        if left() < 170:
            record(f"hybrid_step_mh_tr{tr}", "SKIP")
            continue
        set_tr(tr)
        step, state, batch, key2 = make_step("hybrid")
        c_on, d_p = jnp.float32(1.0), jnp.float32(0.1)
        rngs = [jax.random.fold_in(key2, i) for i in range(14)]
        for i in range(4):
            state, m = step(state, batch, rngs[i], c_on, d_p)
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(8):
            state, m = step(state, batch, rngs[4 + i], c_on, d_p)
        float(m["loss"])
        record(f"hybrid_step_mh_tr{tr}",
               round((time.perf_counter() - t0) / 8 * 1e3, 2))
    print("[voxtune] done", flush=True)


if __name__ == "__main__":
    main()
