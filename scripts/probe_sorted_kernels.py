#!/usr/bin/env python
"""TPU timing of the sorted-window voxel kernels at hybrid model shapes,
vs the XLA baselines.  One clean-exiting process."""
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
print("[sk] device claimed", flush=True)
T0 = time.perf_counter()
RESULTS = {}


def left():
    return BUDGET - (time.perf_counter() - T0)


def record(name, val):
    RESULTS[name] = val
    print(f"{name}: {val}", flush=True)
    with open("/tmp/pcfm_sorted.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def timeit(name, f, *a, iters=10):
    if left() < 40:
        record(name, "SKIP")
        return None
    try:
        o = f(*a)
        o = o[0] if isinstance(o, tuple) else o
        float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        o = o[0] if isinstance(o, tuple) else o
        float(jnp.sum(o.astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / iters * 1e3
        record(name, round(ms, 3))
        return ms
    except Exception as e:
        record(name, f"FAIL {type(e).__name__}: {str(e)[:150]}")
        return None


def main():
    from pcfm.ops.voxel import (avg_voxelize, flatten_voxel_ids,
                                normalize_coords, trilinear_devoxelize)
    from pcfm.ops.voxel_sorted import (avg_voxelize_sorted,
                                       trilinear_devoxelize_sorted)

    B, N = 8, 20000
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (B, N, 3))

    for r, c in ((32, 128), (16, 256)):
        r3 = r ** 3
        nc, vc = normalize_coords(pts, r)
        ids = flatten_voxel_ids(vc, r)
        perm = jnp.argsort(ids, axis=1)
        nc_s = jnp.take_along_axis(nc, perm[..., None], axis=1)
        ids_s = jnp.take_along_axis(ids, perm, axis=1)
        nc_s, ids_s = jax.device_put((nc_s, ids_s))
        feats = jax.random.normal(jax.random.PRNGKey(2), (B, N, c))
        gridf = jax.random.normal(jax.random.PRNGKey(3), (B, r3, c))

        # correctness on-chip (compiled, HIGHEST dot)
        try:
            got = np.asarray(jax.jit(functools.partial(
                avg_voxelize_sorted, resolution=r))(feats, ids_s))
            vc_s = jnp.take_along_axis(vc, perm[..., None], axis=1)
            want = np.asarray(jax.jit(functools.partial(
                avg_voxelize, resolution=r))(feats, vc_s)).reshape(B, r3, c)
            err = float(np.abs(got - want).max())
            record(f"vox_sorted_r{r}_maxerr", err)
        except Exception as e:
            record(f"vox_sorted_r{r}_maxerr", f"FAIL {str(e)[:150]}")
            continue

        vox_s = jax.jit(functools.partial(avg_voxelize_sorted, resolution=r))
        timeit(f"vox_sorted_fwd_r{r}", vox_s, feats, ids_s)
        vox_g = jax.jit(jax.grad(lambda f: jnp.sum(
            avg_voxelize_sorted(f, ids_s, r) ** 2)))
        timeit(f"vox_sorted_fwdbwd_r{r}", vox_g, feats)

        try:
            got = np.asarray(jax.jit(functools.partial(
                trilinear_devoxelize_sorted, resolution=r))(gridf, nc_s))
            want = np.asarray(jax.jit(functools.partial(
                trilinear_devoxelize, resolution=r))(
                    gridf.reshape(B, r, r, r, c), nc_s))
            err = float(np.abs(got - want).max())
            record(f"devox_sorted_r{r}_maxerr", err)
        except Exception as e:
            record(f"devox_sorted_r{r}_maxerr", f"FAIL {str(e)[:150]}")
            continue

        dev_s = jax.jit(functools.partial(trilinear_devoxelize_sorted,
                                          resolution=r))
        timeit(f"devox_sorted_fwd_r{r}", dev_s, gridf, nc_s)
        dev_g = jax.jit(jax.grad(lambda g: jnp.sum(
            trilinear_devoxelize_sorted(g, nc_s, r) ** 2)))
        timeit(f"devox_sorted_fwdbwd_r{r}", dev_g, gridf)

    # the per-step sort amortized over the whole ContextNet
    ids32 = flatten_voxel_ids(normalize_coords(pts, 32)[1], 32)
    srt = jax.jit(lambda i: jnp.argsort(i, axis=1))
    timeit("argsort_8x20k", srt, ids32)

    print("[sk] done, %.0fs left" % left(), flush=True)


if __name__ == "__main__":
    main()
