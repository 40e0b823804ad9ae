#!/usr/bin/env python
"""Probe: scan-based vox speed, r16/c=256 failure bisect, B=1 floor."""
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
print("[s3] device claimed", flush=True)
T0 = time.perf_counter()
RESULTS = {}


def left():
    return BUDGET - (time.perf_counter() - T0)


def record(name, val):
    RESULTS[name] = val
    print(f"{name}: {val}", flush=True)
    with open("/tmp/pcfm_s3.json", "w") as f:
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
    from pcfm.ops.voxel_sorted import (avg_voxelize_sorted,
                                       trilinear_devoxelize_sorted)

    B, N = 8, 20000
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (B, N, 3))
    HI = jax.lax.Precision.HIGHEST
    DE = jax.lax.Precision.DEFAULT

    # ---- new scan-based vox at r32 ----
    r, c = 32, 128
    nc, vc = normalize_coords(pts, r)
    ids = flatten_voxel_ids(vc, r)
    perm = jnp.argsort(ids, axis=1)
    ids_s = jnp.take_along_axis(ids, perm, axis=1)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, N, c))
    vox_s = jax.jit(functools.partial(avg_voxelize_sorted, resolution=r))
    timeit("vox_scan_fwd_r32", vox_s, feats, ids_s)
    vox_g = jax.jit(jax.grad(lambda f: jnp.sum(
        avg_voxelize_sorted(f, ids_s, r) ** 2)))
    timeit("vox_scan_fwdbwd_r32", vox_g, feats)
    # correctness vs XLA
    from pcfm.ops.voxel import avg_voxelize
    vc_s = jnp.take_along_axis(vc, perm[..., None], axis=1)
    got = np.asarray(vox_s(feats, ids_s))
    want = np.asarray(jax.jit(functools.partial(
        avg_voxelize, resolution=r))(feats, vc_s)).reshape(B, r ** 3, c)
    record("vox_scan_r32_maxerr", float(np.abs(got - want).max()))

    # ---- r16 c=256 bisect: raw kernels ----
    r2 = 16
    nc2, vc2 = normalize_coords(pts, r2)
    ids2 = flatten_voxel_ids(vc2, r2)
    perm2 = jnp.argsort(ids2, axis=1)
    ids2_s = jnp.take_along_axis(ids2, perm2, axis=1)
    ones1 = jnp.ones((B, 1, N), jnp.float32)
    for c2 in (128, 256):
        f2 = jax.random.normal(jax.random.PRNGKey(4), (B, N, c2))
        f = jax.jit(functools.partial(scatter_windows, r=r2, w_rows=256,
                                      reach=0, precision=DE))
        timeit(f"scat_r16_c{c2}", f, f2, ids2_s[:, None, :], ones1, ids2_s)
        g2 = jax.random.normal(jax.random.PRNGKey(5), (B, r2 ** 3, c2))
        f = jax.jit(functools.partial(gather_windows, r=r2, w_rows=256,
                                      reach=0, precision=DE))
        timeit(f"gath_r16_c{c2}", f, g2, ids2_s[:, None, :], ones1, ids2_s)

    # full r16 devox at c=256
    nc2_s = jnp.take_along_axis(nc2, perm2[..., None], axis=1)
    g256 = jax.random.normal(jax.random.PRNGKey(6), (B, r2 ** 3, 256))
    dev = jax.jit(functools.partial(trilinear_devoxelize_sorted,
                                    resolution=r2))
    timeit("devox_r16_c256_fwd", dev, g256, nc2_s)
    dev_g = jax.jit(jax.grad(lambda g: jnp.sum(
        trilinear_devoxelize_sorted(g, nc2_s, r2) ** 2)))
    timeit("devox_r16_c256_fwdbwd", dev_g, g256)
    vox2 = jax.jit(functools.partial(avg_voxelize_sorted, resolution=r2))
    f256 = jax.random.normal(jax.random.PRNGKey(7), (B, N, 256))
    timeit("vox_r16_c256_fwd", vox2, f256, ids2_s)

    # ---- B=1 floor test ----
    f = jax.jit(functools.partial(scatter_windows, r=r, w_rows=512,
                                  reach=0, precision=DE))
    timeit("scat_r32_B8", f, feats, ids_s[:, None, :], ones1, ids_s)
    f1 = jax.jit(functools.partial(scatter_windows, r=r, w_rows=512,
                                   reach=0, precision=DE))
    timeit("scat_r32_B1", f1, feats[:1], ids_s[:1, None, :], ones1[:1],
           ids_s[:1])

    print("[s3] done, %.0fs left" % left(), flush=True)


if __name__ == "__main__":
    main()
