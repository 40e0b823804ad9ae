#!/usr/bin/env python
"""Bisect which feature of the sorted-window kernels crashes the remote
Mosaic compiler (HTTP 500, no diagnostics).  Builds the gather kernel up
feature by feature at small size."""
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

BUDGET = float(os.environ.get("PROBE_BUDGET_S", 480))
float(jnp.sum(jnp.ones((8, 8))))
print("[b2] device claimed", flush=True)
T0 = time.perf_counter()
RESULTS = {}
HIGH = jax.lax.Precision.HIGHEST


def left():
    return BUDGET - (time.perf_counter() - T0)


def record(name, val):
    RESULTS[name] = val
    print(f"{name}: {val}", flush=True)
    with open("/tmp/pcfm_b2.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def try_case(name, fn):
    if left() < 30:
        record(name, "SKIP")
        return
    try:
        ok = fn()
        record(name, "OK" if ok in (True, None) else f"WRONG")
    except Exception as e:
        record(name, f"FAIL {type(e).__name__}: {str(e)[:110]}")


W, C, TR = 256, 128, 2
R3P = 4096 + W


def _dot(oh, win):
    return jax.lax.dot_general(oh, win, (((0,), (0,)), ((), ())),
                               precision=HIGH,
                               preferred_element_type=jnp.float32)


# A: static 1-pass gather, 3-D grid, no prefetch, static window start
def case_a():
    def k(grid_ref, ids_ref, out_ref):
        for r in range(TR):
            rel = ids_ref[0, 0, 0, r, :][None, :]
            win = grid_ref[0, 0:W, :]
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
            oh = jnp.where(iota == rel, 1.0, 0.0)
            out_ref[0, r * 128:(r + 1) * 128, :] = _dot(oh, win)

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 256, C), jnp.float32),
        grid=(1, 1, 1),
        in_specs=[pl.BlockSpec((1, R3P, C), lambda b, cc, t: (b, 0, cc)),
                  pl.BlockSpec((1, 1, 1, TR, 128),
                               lambda b, cc, t: (b, 0, t, 0, 0))],
        out_specs=pl.BlockSpec((1, 256, C), lambda b, cc, t: (b, t, cc)))
    g = jax.random.normal(jax.random.PRNGKey(0), (1, R3P, C))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 1, 1, TR, 128), 0,
                             W, jnp.int32)
    got = np.asarray(jax.jit(f)(g, ids))
    want = np.asarray(g)[0][np.asarray(ids).reshape(-1)]
    return bool(np.allclose(got[0], want))


# B: + dynamic window start from SMEM scalar (no prefetch-grid, extra in)
def case_b():
    def k(s_ref, grid_ref, ids_ref, out_ref):
        s = s_ref[0]
        for r in range(TR):
            rel = ids_ref[0, 0, 0, r, :][None, :]
            win = grid_ref[0, pl.ds(s, W), :]
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0) + s
            oh = jnp.where(iota == rel, 1.0, 0.0)
            out_ref[0, r * 128:(r + 1) * 128, :] = _dot(oh, win)

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 256, C), jnp.float32),
        grid=(1, 1, 1),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, R3P, C), lambda b, cc, t: (b, 0, cc)),
                  pl.BlockSpec((1, 1, 1, TR, 128),
                               lambda b, cc, t: (b, 0, t, 0, 0))],
        out_specs=pl.BlockSpec((1, 256, C), lambda b, cc, t: (b, t, cc)))
    g = jax.random.normal(jax.random.PRNGKey(0), (1, R3P, C))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 1, 1, TR, 128), 8,
                             8 + W, jnp.int32)
    got = np.asarray(jax.jit(f)(jnp.asarray([8], jnp.int32), g, ids))
    want = np.asarray(g)[0][np.asarray(ids).reshape(-1)]
    return bool(np.allclose(got[0], want))


# C: + fori_loop with traced bound around the window pass
def case_c():
    def k(s_ref, grid_ref, ids_ref, out_ref):
        s = s_ref[0]
        n_pass = s_ref[1]
        for r in range(TR):
            rel = ids_ref[0, 0, 0, r, :][None, :]

            def body(p, acc):
                base = s + p * W
                win = grid_ref[0, pl.ds(base, W), :]
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (W, 128), 0) + base
                oh = jnp.where(iota == rel, 1.0, 0.0)
                return acc + _dot(oh, win)

            acc = jax.lax.fori_loop(0, n_pass, body,
                                    jnp.zeros((128, C), jnp.float32))
            out_ref[0, r * 128:(r + 1) * 128, :] = acc

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 256, C), jnp.float32),
        grid=(1, 1, 1),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, R3P, C), lambda b, cc, t: (b, 0, cc)),
                  pl.BlockSpec((1, 1, 1, TR, 128),
                               lambda b, cc, t: (b, 0, t, 0, 0))],
        out_specs=pl.BlockSpec((1, 256, C), lambda b, cc, t: (b, t, cc)))
    g = jax.random.normal(jax.random.PRNGKey(0), (1, R3P, C))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 1, 1, TR, 128), 8,
                             8 + 2 * W, jnp.int32)
    got = np.asarray(jax.jit(f)(jnp.asarray([8, 2], jnp.int32), g, ids))
    want = np.asarray(g)[0][np.asarray(ids).reshape(-1)]
    return bool(np.allclose(got[0], want))


# D: + PrefetchScalarGridSpec with (B, n_tiles) scalars
def case_d():
    def k(starts_ref, npass_ref, grid_ref, ids_ref, out_ref):
        b = pl.program_id(0)
        t = pl.program_id(2)
        s = starts_ref[b, t]
        n_pass = npass_ref[b, t]
        for r in range(TR):
            rel = ids_ref[0, 0, 0, r, :][None, :]

            def body(p, acc):
                base = s + p * W
                win = grid_ref[0, pl.ds(base, W), :]
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (W, 128), 0) + base
                oh = jnp.where(iota == rel, 1.0, 0.0)
                return acc + _dot(oh, win)

            acc = jax.lax.fori_loop(0, n_pass, body,
                                    jnp.zeros((128, C), jnp.float32))
            out_ref[0, r * 128:(r + 1) * 128, :] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, 1, 2),
        in_specs=[pl.BlockSpec((1, R3P, C),
                               lambda b, cc, t, s_, n_: (b, 0, cc)),
                  pl.BlockSpec((1, 1, 1, TR, 128),
                               lambda b, cc, t, s_, n_: (b, 0, t, 0, 0))],
        out_specs=pl.BlockSpec((1, 256, C),
                               lambda b, cc, t, s_, n_: (b, t, cc)))
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 512, C), jnp.float32),
        grid_spec=grid_spec)
    g = jax.random.normal(jax.random.PRNGKey(0), (1, R3P, C))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 1, 2, TR, 128), 8,
                             8 + W, jnp.int32)
    starts = jnp.asarray([[8, 8]], jnp.int32)
    npass = jnp.asarray([[1, 1]], jnp.int32)
    got = np.asarray(jax.jit(f)(starts, npass, g, ids))
    want = np.asarray(g)[0][np.asarray(ids).transpose(0, 2, 3, 4, 1)
                            .reshape(-1)]
    return bool(np.allclose(got[0], want))


# E: scatter minimal — dyn-slice read-modify-write accumulate
def case_e():
    def k(s_ref, ids_ref, upd_ref, out_ref):
        s = s_ref[0]

        out_ref[:] = jnp.zeros_like(out_ref)
        iota = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0) + s
        part = jnp.zeros((W, C), jnp.float32)
        for r in range(TR):
            rel = ids_ref[0, 0, 0, r, :][None, :]
            oh = jnp.where(iota == rel, 1.0, 0.0)
            upd_r = upd_ref[0, r * 128:(r + 1) * 128, :]
            part = part + jax.lax.dot_general(
                oh, upd_r, (((1,), (0,)), ((), ())), precision=HIGH,
                preferred_element_type=jnp.float32)
        cur = out_ref[0, pl.ds(s, W), :]
        out_ref[0, pl.ds(s, W), :] = cur + part

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, R3P, C), jnp.float32),
        grid=(1, 1, 1),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 1, 1, TR, 128),
                               lambda b, cc, t: (b, 0, t, 0, 0)),
                  pl.BlockSpec((1, 256, C), lambda b, cc, t: (b, t, cc))],
        out_specs=pl.BlockSpec((1, R3P, C), lambda b, cc, t: (b, 0, cc)))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 1, 1, TR, 128), 8,
                             8 + W, jnp.int32)
    upd = jax.random.normal(jax.random.PRNGKey(2), (1, 256, C))
    got = np.asarray(jax.jit(f)(jnp.asarray([8], jnp.int32), ids, upd))
    want = np.zeros((R3P, C), np.float32)
    np.add.at(want, np.asarray(ids).reshape(-1), np.asarray(upd)[0])
    return bool(np.allclose(got[0], want, atol=1e-5))


# F: big grid block at R=32 size (1, 34816, 128) — VMEM capacity
def case_f():
    big = 32768 + 2048

    def k(grid_ref, out_ref):
        out_ref[:] = grid_ref[0, 0:256, :][None]

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 256, C), jnp.float32),
        in_specs=[pl.BlockSpec((1, big, C), lambda: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, 256, C), lambda: (0, 0, 0)))
    g = jax.random.normal(jax.random.PRNGKey(0), (1, big, C))
    got = np.asarray(jax.jit(f)(g))
    return bool(np.allclose(got[0], np.asarray(g)[0, :256]))


def main():
    try_case("A_static_gather", case_a)
    try_case("B_dyn_start", case_b)
    try_case("C_fori_traced_bound", case_c)
    try_case("D_prefetch_grid", case_d)
    try_case("E_scatter_rmw", case_e)
    try_case("F_big_block_17mb", case_f)
    print("[b2] done, %.0fs left" % left(), flush=True)


if __name__ == "__main__":
    main()
