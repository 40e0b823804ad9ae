#!/usr/bin/env python
"""ROADMAP perf #1 retry-or-retire session (r5, VERDICT #4).

The r2 'promising design' for the voxel hot path was a DMA-pipelined
kernel keeping the grid in VMEM with a vectorized per-point row gather.
Two facts have changed since:
  * the production sorted-window kernels ALREADY keep the whole padded
    (R^3, cb) grid block VMEM-resident across the tile loop (BlockSpec
    index_map is constant in t), so 'keep the grid in VMEM' is done;
  * the only remaining alternative primitive is an in-kernel vectorized
    dynamic row gather (jnp.take on the VMEM block) replacing the
    multi-hot build + MXU window dots.

This probe settles it with measurements on the real chip:
  1. feature bisect — does Mosaic compile (a) in-kernel jnp.take at the
     REAL stage-0 size (32k-row VMEM table), (b) dynamic-offset HBM DMA
     (pltpu.make_async_copy), (c) big-VMEM dynamic slices?  Each failure
     names the blocking feature for the ROADMAP record.
  2. timed A/B at the exact stage-0 devox shape (B=8, N=20k, R=32,
     C=128, 8 corners): candidate taa-gather kernel vs the production
     gather_windows vs plain XLA take_along_axis.

Writes docs/pallas_probe_r5.json.  One clean-exiting TPU session,
budget-guarded (PROBE_BUDGET_S, default 560).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("PROBE_CPU"):        # syntax/plumbing smoke off-chip
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BUDGET = float(os.environ.get("PROBE_BUDGET_S", 560))
OUT = os.path.join(os.path.dirname(__file__), "..", "docs",
                   "pallas_probe_r5.json")

float(jnp.sum(jnp.ones((8, 8))))
print("[probe] device claimed:", jax.devices()[0], flush=True)
T0 = time.perf_counter()
RESULTS = {}

_VMEM_LIMIT = 100 * 2 ** 20


def left():
    return BUDGET - (time.perf_counter() - T0)


def record(name, val):
    RESULTS[name] = val
    print(f"[probe] {name}: {val}", flush=True)
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(RESULTS, f, indent=1)
    os.replace(tmp, OUT)


def try_case(name, fn, min_budget=40):
    if left() < min_budget:
        record(name, "SKIP budget")
        return None
    try:
        v = fn()
        record(name, v if v is not None else "OK")
        return v
    except Exception as e:  # noqa: BLE001 — the failure NAME is the result
        record(name, f"FAIL {type(e).__name__}: {str(e)[:180]}")
        return None


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(f, *args, iters=20):
    sync(f(*args))                       # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        y = f(*args)
    s = sync(y)
    dt = (time.perf_counter() - t0) / (iters - 1) * 1e3
    return dt, s


# ---------------- realistic stage-0 devox inputs ----------------
B, N, R, C = 8, 20000, 32, 128
R3 = R * R * R


def make_inputs(seed=0):
    from pcfm.ops.voxel_sorted import corner_data
    kc, kg = jax.random.split(jax.random.PRNGKey(seed))
    coords = jax.random.uniform(kc, (B, N, 3), jnp.float32,
                                0.0, R - 1 - 1e-4)
    fl = jnp.floor(coords).astype(jnp.int32)
    base = (fl[..., 0] * R + fl[..., 1]) * R + fl[..., 2]
    order = jnp.argsort(base, axis=1)
    coords = jnp.take_along_axis(coords, order[..., None], axis=1)
    ids8, w8, base_s = corner_data(coords, R)          # (B,8,N)x2, (B,N)
    grid = jax.random.normal(kg, (B, R3, C), jnp.float32)
    return grid, ids8, w8, base_s


# ---------------- feature case a: in-kernel take at real size ----------
TILE = 256


def taa_kernel(grid_ref, ids_ref, w_ref, o_ref):
    g = grid_ref[0]                                    # (R3, C) VMEM
    acc = jnp.zeros((TILE, C), jnp.float32)
    for kk in range(8):
        idx = ids_ref[0, kk, 0]                        # (TILE,)
        rows = jnp.take(g, idx, axis=0)                # dynamic row gather
        acc = acc + w_ref[0, kk, 0][:, None] * rows
    o_ref[0] = acc


def build_taa():
    n_pad = (N + TILE - 1) // TILE * TILE
    n_tiles = n_pad // TILE

    def pad_ids(ids8, w8):
        padn = n_pad - N
        ids_p = jnp.pad(ids8, ((0, 0), (0, 0), (0, padn)))
        w_p = jnp.pad(w8, ((0, 0), (0, 0), (0, padn)))
        return (ids_p.reshape(B, 8, n_tiles, TILE),
                w_p.reshape(B, 8, n_tiles, TILE))

    f = pl.pallas_call(
        taa_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, R3, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 8, 1, TILE), lambda b, t: (b, 0, t, 0)),
            pl.BlockSpec((1, 8, 1, TILE), lambda b, t: (b, 0, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )

    @jax.jit
    def run(grid, ids8, w8):
        ids_t, w_t = pad_ids(ids8, w8)
        return f(grid, ids_t, w_t)[:, :N]

    return run


def taa_kernel_t(grid_ref, ids_ref, w_ref, o_ref):
    # transposed layout: ids/w blocks are (1, 1, 8, TILE) so the LAST TWO
    # block dims are (8, TILE) — Mosaic requires them divisible by (8, 128)
    g = grid_ref[0]                                    # (R3, C) VMEM
    acc = jnp.zeros((TILE, C), jnp.float32)
    for kk in range(8):
        idx = ids_ref[0, 0, kk]                        # (TILE,)
        rows = jnp.take(g, idx, axis=0)                # dynamic row gather
        acc = acc + w_ref[0, 0, kk][:, None] * rows
    o_ref[0] = acc


def build_taa_t():
    n_pad = (N + TILE - 1) // TILE * TILE
    n_tiles = n_pad // TILE

    def pad_ids(ids8, w8):
        padn = n_pad - N
        ids_p = jnp.pad(ids8, ((0, 0), (0, 0), (0, padn)))
        w_p = jnp.pad(w8, ((0, 0), (0, 0), (0, padn)))
        # (B, 8, n_tiles, TILE) -> (B, n_tiles, 8, TILE)
        return (ids_p.reshape(B, 8, n_tiles, TILE).transpose(0, 2, 1, 3),
                w_p.reshape(B, 8, n_tiles, TILE).transpose(0, 2, 1, 3))

    f = pl.pallas_call(
        taa_kernel_t,
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, R3, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, 8, TILE), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 8, TILE), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )

    @jax.jit
    def run(grid, ids8, w8):
        ids_t, w_t = pad_ids(ids8, w8)
        return f(grid, ids_t, w_t)[:, :N]

    return run


def taa_kernel_taa(grid_ref, ids_ref, w_ref, o_ref):
    # take_along_axis form: indices broadcast to the output shape so the
    # gather is elementwise in the minor (lane) dim — the form Mosaic's
    # gather lowering actually supports.
    g = grid_ref[0]                                    # (R3, C) VMEM
    acc = jnp.zeros((TILE, C), jnp.float32)
    for kk in range(8):
        idx = ids_ref[0, 0, kk]                        # (TILE,)
        idx2 = jnp.broadcast_to(idx[:, None], (TILE, C))
        rows = jnp.take_along_axis(g, idx2, axis=0)    # (TILE, C)
        acc = acc + w_ref[0, 0, kk][:, None] * rows
    o_ref[0] = acc


def build_taa_taa():
    n_pad = (N + TILE - 1) // TILE * TILE
    n_tiles = n_pad // TILE

    def pad_ids(ids8, w8):
        padn = n_pad - N
        ids_p = jnp.pad(ids8, ((0, 0), (0, 0), (0, padn)))
        w_p = jnp.pad(w8, ((0, 0), (0, 0), (0, padn)))
        return (ids_p.reshape(B, 8, n_tiles, TILE).transpose(0, 2, 1, 3),
                w_p.reshape(B, 8, n_tiles, TILE).transpose(0, 2, 1, 3))

    f = pl.pallas_call(
        taa_kernel_taa,
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, R3, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, 8, TILE), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 8, TILE), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )

    @jax.jit
    def run(grid, ids8, w8):
        ids_t, w_t = pad_ids(ids8, w8)
        return f(grid, ids_t, w_t)[:, :N]

    return run


def case_taa_take_along():
    grid, ids8, w8, _ = make_inputs()
    run = build_taa_taa()
    got = run(grid, ids8, w8)
    want = jax.jit(xla_ref)(grid, ids8, w8)
    err = float(jnp.max(jnp.abs(got - want)))
    if err > 1e-3:
        return f"WRONG maxerr {err:.2e}"
    dt, _ = timeit(run, grid, ids8, w8)
    return f"OK maxerr {err:.2e}, {dt:.2f} ms"


def case_taa_fixed_layout():
    grid, ids8, w8, _ = make_inputs()
    run = build_taa_t()
    got = run(grid, ids8, w8)
    want = jax.jit(xla_ref)(grid, ids8, w8)
    err = float(jnp.max(jnp.abs(got - want)))
    if err > 1e-3:
        return f"WRONG maxerr {err:.2e}"
    dt, _ = timeit(run, grid, ids8, w8)
    return f"OK maxerr {err:.2e}, {dt:.2f} ms"


def xla_ref(grid, ids8, w8):
    # out[b,n,c] = sum_k w8[b,k,n] * grid[b, ids8[b,k,n], c]
    g = jnp.take_along_axis(grid[:, None], ids8[..., None], axis=2)
    return jnp.sum(w8[..., None] * g, axis=1)


def case_taa_real():
    grid, ids8, w8, _ = make_inputs()
    run = build_taa()
    got = run(grid, ids8, w8)
    want = jax.jit(xla_ref)(grid, ids8, w8)
    err = float(jnp.max(jnp.abs(got - want)))
    if err > 1e-3:
        return f"WRONG maxerr {err:.2e}"
    dt, _ = timeit(run, grid, ids8, w8)
    return f"OK maxerr {err:.2e}, {dt:.2f} ms"


# ---------------- feature case b: dynamic-offset HBM DMA ----------------
def case_hbm_dma():
    S, W = 8192, 512

    def k(start_ref, hbm_ref, o_ref):
        def body(scr, sem):
            s = start_ref[0]
            dma = pltpu.make_async_copy(hbm_ref.at[pl.ds(s, W), :], scr,
                                        sem)
            dma.start()
            dma.wait()
            o_ref[:] = scr[:]
        pl.run_scoped(body, scr=pltpu.VMEM((W, C), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA)

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((W, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    big = jax.random.normal(jax.random.PRNGKey(0), (S, C), jnp.float32)
    start = jnp.asarray([1024], jnp.int32)
    got = np.asarray(jax.jit(f)(start, big))
    ok = np.allclose(got, np.asarray(big)[1024:1024 + W])
    return "OK" if ok else "WRONG"


# ---------------- feature case c: big-VMEM dynamic slice ----------------
def case_dynslice_big():
    W = 512

    def k(start_ref, big_ref, o_ref):
        s = start_ref[0]
        o_ref[:] = big_ref[pl.ds(pl.multiple_of(s, 8), W), :]

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((W, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT))
    big = jax.random.normal(jax.random.PRNGKey(0), (R3, C), jnp.float32)
    start = jnp.asarray([1024], jnp.int32)
    got = np.asarray(jax.jit(f)(start, big))
    ok = np.allclose(got, np.asarray(big)[1024:1024 + W])
    return "OK" if ok else "WRONG"


# ---------------- timed production + XLA baselines ----------------
def case_time_production():
    from pcfm.ops.voxel_sorted import trilinear_devoxelize_sorted

    grid, ids8, w8, base = make_inputs()
    coordsless = (ids8, w8, base)

    @jax.jit
    def run(grid):
        return trilinear_devoxelize_sorted(grid, None, R,
                                           corners=coordsless)

    dt, _ = timeit(run, grid)
    return f"{dt:.2f} ms"


def case_time_xla():
    grid, ids8, w8, _ = make_inputs()
    f = jax.jit(xla_ref)
    dt, _ = timeit(f, grid, ids8, w8)
    return f"{dt:.2f} ms"


def main():
    try_case("taa_gather_real_32k_table", case_taa_real, min_budget=120)
    try_case("taa_gather_fixed_layout", case_taa_fixed_layout,
             min_budget=120)
    try_case("taa_gather_take_along_axis", case_taa_take_along,
             min_budget=120)
    try_case("hbm_dma_dynamic_offset", case_hbm_dma)
    try_case("dynslice_big_vmem", case_dynslice_big)
    try_case("production_gather_windows_devox_fwd", case_time_production,
             min_budget=90)
    try_case("xla_take_along_axis_devox_fwd", case_time_xla, min_budget=60)
    print(f"[probe] done in {time.perf_counter() - T0:.0f}s -> {OUT}",
          flush=True)


if __name__ == "__main__":
    main()
