#!/usr/bin/env python
"""Bisect which Pallas/Mosaic features compile through the axon remote
compiler (HTTP 500s are opaque — this enumerates the feature space).
One clean-exiting process, budget-guarded."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BUDGET = float(os.environ.get("PROBE_BUDGET_S", 480))
float(jnp.sum(jnp.ones((8, 8))))
print("[bisect] device claimed", flush=True)
T0 = time.perf_counter()
RESULTS = {}


def left():
    return BUDGET - (time.perf_counter() - T0)


def record(name, val):
    RESULTS[name] = val
    print(f"{name}: {val}", flush=True)
    with open("/tmp/pcfm_bisect.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def try_case(name, build_and_run):
    if left() < 30:
        record(name, "SKIP budget")
        return False
    try:
        ok = build_and_run()
        record(name, "OK" if ok in (True, None) else f"WRONG {ok}")
        return True
    except Exception as e:
        record(name, f"FAIL {type(e).__name__}: {str(e)[:140]}")
        return False


# ---- 0. round-1 known-good: chamfer v3 compiles? ----

def case_chamfer_v3():
    from pcfm.ops.pallas import chamfer_distance_pallas_v3
    a = jax.random.normal(jax.random.PRNGKey(0), (1, 512, 3))
    d1, _, _, _ = chamfer_distance_pallas_v3(a, a)
    return float(jnp.max(d1)) == 0.0


# ---- 1. trivial copy ----

def case_copy():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((128, 128),
                                                         jnp.float32),
                       in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                       out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    x = jnp.ones((128, 128), jnp.float32)
    return bool(jnp.all(jax.jit(f)(x) == 2.0))


# ---- 2. VMEM scratch ----

def case_scratch(rows):
    def k(x_ref, o_ref, s):
        s[:] = jnp.zeros_like(s)
        s[0:128, :] = x_ref[:]
        o_ref[:] = s[0:128, :]
    def run():
        f = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)])
        x = jnp.ones((128, 128), jnp.float32)
        return bool(jnp.all(jax.jit(f)(x) == 1.0))
    return run


# ---- 3. in-kernel matmul + iota + compare (sorted-window core) ----

def case_onehot_matmul():
    T, W, C = 128, 512, 128

    def k(ids_ref, win_ref, o_ref):
        rel = ids_ref[:]                                    # (T, 1) int32
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
        oh = (iota == jnp.broadcast_to(rel, (T, W))).astype(jnp.float32)
        o_ref[:] = jnp.dot(oh, win_ref[:],
                           preferred_element_type=jnp.float32)

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    ids = jax.random.randint(jax.random.PRNGKey(0), (T, 1), 0, W, jnp.int32)
    win = jax.random.normal(jax.random.PRNGKey(1), (W, C), jnp.float32)
    got = np.asarray(jax.jit(f)(ids, win))
    want = np.asarray(win)[np.asarray(ids)[:, 0]]
    return bool(np.allclose(got, want, atol=1e-5))


# ---- 4. one-hot matmul SCATTER (transpose direction) ----

def case_onehot_scatter():
    T, W, C = 128, 512, 128

    def k(ids_ref, upd_ref, o_ref):
        rel = ids_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)
        oh = (iota == jnp.broadcast_to(rel[:, 0][None, :],
                                       (W, T))).astype(jnp.float32)
        o_ref[:] = jnp.dot(oh, upd_ref[:],
                           preferred_element_type=jnp.float32)

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((W, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    ids = jax.random.randint(jax.random.PRNGKey(0), (T, 1), 0, W, jnp.int32)
    upd = jax.random.normal(jax.random.PRNGKey(1), (T, C), jnp.float32)
    got = np.asarray(jax.jit(f)(ids, upd))
    want = np.zeros((W, C), np.float32)
    np.add.at(want, np.asarray(ids)[:, 0], np.asarray(upd))
    return bool(np.allclose(got, want, atol=1e-4))


# ---- 5. dynamic slice read from a big VMEM input ----

def case_dynslice():
    S, W, C = 8192, 512, 128

    def k(start_ref, big_ref, o_ref):
        s = start_ref[0]
        o_ref[:] = big_ref[pl.ds(pl.multiple_of(s, 8), W), :]

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((W, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    big = jax.random.normal(jax.random.PRNGKey(0), (S, C), jnp.float32)
    start = jnp.asarray([1024], jnp.int32)
    got = np.asarray(jax.jit(f)(start, big))
    return bool(np.allclose(got, np.asarray(big)[1024:1024 + W]))


# ---- 6. HBM input + in-kernel DMA with dynamic offset ----

def case_hbm_dma():
    S, W, C = 8192, 512, 128

    def k(start_ref, hbm_ref, o_ref):
        def body(scr, sem):
            s = start_ref[0]
            dma = pltpu.make_async_copy(hbm_ref.at[pl.ds(s, W), :], scr, sem)
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
    return bool(np.allclose(got, np.asarray(big)[1024:1024 + W]))


# ---- 7. grid + scalar prefetch index_map ----

def case_prefetch_grid():
    S, T, C = 1024, 128, 128

    def k(starts_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S // T,),
        in_specs=[pl.BlockSpec((T, C), lambda i, starts: (starts[i], 0))],
        out_specs=pl.BlockSpec((T, C), lambda i, starts: (i, 0)))
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((S, C), jnp.float32),
        grid_spec=grid_spec)
    x = jnp.arange(S * C, dtype=jnp.float32).reshape(S, C)
    starts = jnp.zeros((S // T,), jnp.int32)      # all blocks read block 0
    got = np.asarray(jax.jit(f)(starts, x))
    want = np.tile(np.asarray(x)[:T], (S // T, 1)) + 1.0
    return bool(np.allclose(got, want))


# ---- 8. fori_loop + accumulation in scratch, grid over tiles ----

def case_loop_accum():
    T, C = 128, 128

    def k(x_ref, o_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += x_ref[:]

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
        grid=(4,),
        in_specs=[pl.BlockSpec((T, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)])
    x = jnp.ones((4 * T, C), jnp.float32)
    got = np.asarray(jax.jit(f)(x))
    return bool(np.allclose(got, 4.0))


# ---- 9. tiny take_along_axis ----

def case_taa():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 128))
    ids = jnp.zeros((8, 128), jnp.int32)
    got = np.asarray(jax.jit(f)(x, ids))
    return bool(np.allclose(got, np.asarray(x)[0][None].repeat(8, 0)))


def main():
    try_case("chamfer_v3_compiles", case_chamfer_v3)
    try_case("copy", case_copy)
    try_case("scratch_128r", case_scratch(128))
    try_case("scratch_32k_rows_16mb", case_scratch(32768))
    try_case("onehot_matmul_gather", case_onehot_matmul)
    try_case("onehot_matmul_scatter", case_onehot_scatter)
    try_case("dynslice_vmem", case_dynslice)
    try_case("hbm_dma_dyn_offset", case_hbm_dma)
    try_case("prefetch_grid_indexmap", case_prefetch_grid)
    try_case("grid_loop_accum", case_loop_accum)
    try_case("take_along_axis_tiny", case_taa)
    print("[bisect] done, %.0fs left" % left(), flush=True)


if __name__ == "__main__":
    main()
