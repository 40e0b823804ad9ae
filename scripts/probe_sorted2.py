#!/usr/bin/env python
"""Probe: where does sorted-kernel time go?  W-scaling (MXU-bound vs
overhead-bound), grouped devox, DEFAULT-precision floor."""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BUDGET = float(os.environ.get("PROBE_BUDGET_S", 540))
float(jnp.sum(jnp.ones((8, 8))))
print("[s2] device claimed", flush=True)
T0 = time.perf_counter()
RESULTS = {}


def left():
    return BUDGET - (time.perf_counter() - T0)


def record(name, val):
    RESULTS[name] = val
    print(f"{name}: {val}", flush=True)
    with open("/tmp/pcfm_s2.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def timeit(name, f, *a, iters=10):
    if left() < 40:
        record(name, "SKIP")
        return None
    try:
        o = f(*a)
        float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        float(jnp.sum(o.astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / iters * 1e3
        record(name, round(ms, 3))
        return ms
    except Exception as e:
        record(name, f"FAIL {type(e).__name__}: {str(e)[:130]}")
        return None


def main():
    from pcfm.ops.pallas.voxel_sorted import gather_windows, scatter_windows
    from pcfm.ops.voxel import flatten_voxel_ids, normalize_coords
    from pcfm.ops.voxel_sorted import corner_data

    B, N, C, r = 8, 20000, 128, 32
    r3 = r ** 3
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (B, N, 3))
    nc, vc = normalize_coords(pts, r)
    ids = flatten_voxel_ids(vc, r)
    perm = jnp.argsort(ids, axis=1)
    nc_s = jnp.take_along_axis(nc, perm[..., None], axis=1)
    ids_s = jnp.take_along_axis(ids, perm, axis=1)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, N, C))
    gridf = jax.random.normal(jax.random.PRNGKey(3), (B, r3, C))
    ones1 = jnp.ones((B, 1, N), jnp.float32)
    HI = jax.lax.Precision.HIGHEST
    DE = jax.lax.Precision.DEFAULT

    # --- K=1 scatter, W scaling, HIGHEST ---
    for W in (256, 512, 1024):
        f = jax.jit(functools.partial(scatter_windows, r=r, w_rows=W,
                                      reach=0, precision=HI))
        timeit(f"scat_k1_W{W}_HI", f, feats, ids_s[:, None, :], ones1,
               ids_s)
    # DEFAULT floor
    f = jax.jit(functools.partial(scatter_windows, r=r, w_rows=512,
                                  reach=0, precision=DE))
    timeit("scat_k1_W512_DEF", f, feats, ids_s[:, None, :], ones1, ids_s)

    # --- K=1 gather, W scaling ---
    for W in (256, 512, 1024):
        f = jax.jit(functools.partial(gather_windows, r=r, w_rows=W,
                                      reach=0, precision=HI))
        timeit(f"gath_k1_W{W}_HI", f, gridf, ids_s[:, None, :], ones1,
               ids_s)
    f = jax.jit(functools.partial(gather_windows, r=r, w_rows=512,
                                  reach=0, precision=DE))
    timeit("gath_k1_W512_DEF", f, gridf, ids_s[:, None, :], ones1, ids_s)

    # --- grouped devox (2 x K=4, W=512) ---
    ids8, w8, base = corner_data(nc_s, r)

    def devox_grouped(g, prec, W):
        lo = gather_windows(g, ids8[:, :4], w8[:, :4], base, r, W,
                            reach=r + 1, precision=prec)
        hi = gather_windows(g, ids8[:, 4:], w8[:, 4:], base + r * r, r, W,
                            reach=r + 1, precision=prec)
        return lo + hi

    for prec, tag in ((HI, "HI"), (DE, "DEF")):
        f = jax.jit(functools.partial(devox_grouped, prec=prec, W=512))
        timeit(f"devox_grp_W512_{tag}", f, gridf)

    # correctness of grouped devox vs XLA corner form
    from pcfm.ops.voxel import trilinear_devoxelize
    got = np.asarray(jax.jit(functools.partial(
        devox_grouped, prec=HI, W=512))(gridf))
    want = np.asarray(jax.jit(functools.partial(
        trilinear_devoxelize, resolution=r))(
            gridf.reshape(B, r, r, r, C), nc_s))
    record("devox_grp_maxerr", float(np.abs(got - want).max()))

    print("[s2] done, %.0fs left" % left(), flush=True)


if __name__ == "__main__":
    main()
