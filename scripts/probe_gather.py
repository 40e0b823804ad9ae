#!/usr/bin/env python
"""One-session TPU probe for the R=32 voxel-wall redesign (round 2).

Measures, in one clean-exiting process with an internal budget:
  0. VMEM capacity probe (largest pallas scratch that compiles+runs)
  1. Mosaic dynamic_gather (take_along_axis inside a pallas kernel):
     compile limits + per-call latency at (S, 128)
  2. XLA baselines at EXACT hybrid model shapes (B=8, N=20000, C=128):
     devox fwd / fwd+bwd, vox fwd / fwd+bwd at R=32 and R=16
  3. XLA fold-8 wide-row gather devox prototype (f32 and bf16 table):
     correctness vs corner form + fwd / fwd+bwd timing
  4. sort / take-with-sorted-ids probes
Results stream to /tmp/pcfm_probe.json.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BUDGET = float(os.environ.get("PROBE_BUDGET_S", 600))
float(jnp.sum(jnp.ones((8, 8))))
print("[probe] device claimed", flush=True)
T0 = time.perf_counter()
RESULTS = {}


def left():
    return BUDGET - (time.perf_counter() - T0)


def record(name, val):
    RESULTS[name] = val
    print(f"{name}: {val}", flush=True)
    with open("/tmp/pcfm_probe.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def timeit(name, f, *a, iters=10):
    if left() < 45:
        print(f"skip {name} (budget)", flush=True)
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
        record(name, f"FAIL {type(e).__name__}: {str(e)[:180]}")
        return None


# ---------------- 0. VMEM capacity ----------------

def vmem_probe():
    for mb in (100, 64, 32, 16):
        rows = mb * 1024 * 1024 // (128 * 4)

        def kern(x_ref, o_ref, scratch):
            scratch[0, :] = x_ref[0, :]
            o_ref[:] = scratch[0:8, :]

        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
            )
            r = jax.jit(f)(jnp.ones((8, 128), jnp.float32))
            float(jnp.sum(r))
            record("vmem_scratch_ok_mb", mb)
            return
        except Exception as e:
            record(f"vmem_{mb}mb", f"FAIL {str(e)[:120]}")


# ---------------- 1. dynamic_gather in pallas ----------------

def make_gather_kernel(s, c, reps):
    def kern(src_ref, ids_ref, out_ref):
        src = src_ref[:]
        idx = jnp.broadcast_to(ids_ref[:], (s, c))
        acc = jnp.take_along_axis(src, idx, axis=0)
        # repeat to amortize call overhead: rotate ids to defeat CSE
        for k in range(1, reps):
            acc = acc + jnp.take_along_axis(src, (idx + k) % s, axis=0)
        out_ref[:] = acc

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((s, c), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def gather_probe():
    c = 128
    for s in (256, 1024, 8192, 32768):
        if left() < 60:
            return
        key = jax.random.PRNGKey(0)
        src = jax.random.normal(key, (s, c), jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(1), (s, 1), 0, s,
                                 jnp.int32)
        # correctness (reps=1)
        try:
            f1 = jax.jit(make_gather_kernel(s, c, 1))
            got = np.asarray(f1(src, ids))
            want = np.asarray(src)[np.asarray(ids)[:, 0]]
            ok = bool(np.allclose(got, want))
            record(f"dyn_gather_s{s}_correct", ok)
        except Exception as e:
            record(f"dyn_gather_s{s}_correct",
                   f"FAIL {type(e).__name__}: {str(e)[:160]}")
            continue
        reps = 10
        fr = jax.jit(make_gather_kernel(s, c, reps))
        ms = timeit(f"dyn_gather_s{s}_x{reps}", fr, src, ids, iters=20)
        if ms is not None:
            per = ms / reps * 1e3
            record(f"dyn_gather_s{s}_us_per_gather", round(per, 2))


# ---------------- 2. XLA baselines at model shapes ----------------

B, N, C = 8, 20000, 128


def corner_devox(grid, nc, r):
    from pcfm.ops.voxel import trilinear_devoxelize
    return trilinear_devoxelize(grid, nc, r)


def wide_devox(grid, nc, r, table_dtype=jnp.float32):
    """Fold-8 wide-row gather: ONE take of (N) rows x 8C wide from a
    shifted-concat table, then weighted sum of the 8 channel blocks."""
    from pcfm.ops.voxel import _corner_ids_weights
    b, _, _, _, c = grid.shape
    r3 = r * r * r
    flat = grid.reshape(b, r3, c).astype(table_dtype)
    offs = [0, 1, r, r + 1, r * r, r * r + 1, r * r + r, r * r + r + 1]
    wide = jnp.concatenate(
        [jnp.pad(flat[:, off:], ((0, 0), (0, off), (0, 0))) for off in offs],
        axis=-1)                                             # (B, R3, 8C)
    coords = jax.lax.stop_gradient(nc.astype(jnp.float32))
    lo = jnp.floor(coords).astype(jnp.int32)
    base = (lo[..., 0] * r + lo[..., 1]) * r + lo[..., 2]    # (B, N)
    _, w8 = _corner_ids_weights(nc, r)                       # (B, N, 8)
    g = jnp.take_along_axis(wide, base[..., None], axis=1)   # (B, N, 8C)
    g = g.reshape(b, g.shape[1], 8, c).astype(jnp.float32)
    return jnp.sum(w8[..., None] * g, axis=2)


def run_shape_baselines():
    from pcfm.ops.voxel import avg_voxelize, normalize_coords
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (B, N, 3), jnp.float32)

    for r in (32, 16):
        nc, vc = normalize_coords(pts, r)
        nc = jax.device_put(nc)
        vc = jax.device_put(vc)
        feats = jax.random.normal(jax.random.PRNGKey(2), (B, N, C),
                                  jnp.float32)
        grid = jax.random.normal(jax.random.PRNGKey(3), (B, r, r, r, C),
                                 jnp.float32)

        vox = jax.jit(functools.partial(avg_voxelize, resolution=r))
        timeit(f"xla_vox_fwd_r{r}", vox, feats, vc)
        vox_g = jax.jit(jax.grad(
            lambda f: jnp.sum(avg_voxelize(f, vc, r) ** 2)))
        timeit(f"xla_vox_fwdbwd_r{r}", vox_g, feats)

        dev = jax.jit(functools.partial(corner_devox, r=r))
        timeit(f"xla_devox_fwd_r{r}", dev, grid, nc)
        dev_g = jax.jit(jax.grad(
            lambda g: jnp.sum(corner_devox(g, nc, r) ** 2)))
        timeit(f"xla_devox_fwdbwd_r{r}", dev_g, grid)

        # fold-8 wide prototype
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            wd = jax.jit(functools.partial(wide_devox, r=r, table_dtype=dt))
            # correctness vs corner form
            try:
                got = np.asarray(wd(grid, nc))
                want = np.asarray(jax.jit(
                    functools.partial(corner_devox, r=r))(grid, nc))
                err = float(np.max(np.abs(got - want))
                            / (np.max(np.abs(want)) + 1e-9))
                record(f"wide_devox_{tag}_r{r}_relerr", round(err, 6))
            except Exception as e:
                record(f"wide_devox_{tag}_r{r}_relerr",
                       f"FAIL {str(e)[:120]}")
                continue
            timeit(f"wide_devox_{tag}_fwd_r{r}", wd, grid, nc)
            wd_g = jax.jit(jax.grad(
                lambda g: jnp.sum(wide_devox(g, nc, r, dt) ** 2)))
            timeit(f"wide_devox_{tag}_fwdbwd_r{r}", wd_g, grid)


# ---------------- 4. sort probes ----------------

def sort_probe():
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, 8 * N), 0, 32768,
                             jnp.int32)
    srt = jax.jit(lambda x: jnp.sort(x, axis=-1))
    timeit("sort_ids_8x160k", srt, ids)
    asrt = jax.jit(lambda x: jnp.argsort(x, axis=-1))
    timeit("argsort_ids_8x160k", asrt, ids)

    # row gather with sorted vs unsorted ids (does XLA care?)
    table = jax.random.normal(jax.random.PRNGKey(1), (B, 32768, C))
    ids_n = jax.random.randint(jax.random.PRNGKey(2), (B, N), 0, 32768,
                               jnp.int32)
    ids_s = jnp.sort(ids_n, axis=-1)
    tk = jax.jit(lambda t, i: jnp.take_along_axis(t, i[..., None], axis=1))
    timeit("take_20k_rows_unsorted", tk, table, ids_n)
    timeit("take_20k_rows_sorted", tk, table, ids_s)
    # wide rows: same row count, 8C wide
    tablew = jax.random.normal(jax.random.PRNGKey(3), (B, 32768, 8 * C))
    timeit("take_20k_rows_8Cwide", tk, tablew, ids_n)


def main():
    vmem_probe()
    gather_probe()
    run_shape_baselines()
    sort_probe()
    print("[probe] done, budget left %.0fs" % left(), flush=True)


if __name__ == "__main__":
    main()
