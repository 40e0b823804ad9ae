#!/usr/bin/env python
"""Experiment: Pallas scalar-loop row gather/scatter from VMEM vs XLA
gather — deciding the R=32 devoxelize strategy.

Kernel A (gather): out[i, :] = table[ids[i], :] with the table resident in
VMEM and a fori_loop over points.
Kernel B (devox8): out[i, :] = sum_k w[i,k] * table[ids8[i,k], :].
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

float(jnp.sum(jnp.ones((8, 8))))
print("[pallas-gather] device claimed", flush=True)

N, R3, C = 20000, 32768, 128
TN = 2000  # points per grid cell


def gather_kernel(ids_ref, table_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = table_ref[ids_ref[i, 0], :]
        return 0
    jax.lax.fori_loop(0, TN, body, 0)


def devox8_kernel(ids_ref, w_ref, table_ref, out_ref):
    def body(i, _):
        acc = w_ref[i, 0] * table_ref[ids_ref[i, 0], :]
        for k in range(1, 8):
            acc = acc + w_ref[i, k] * table_ref[ids_ref[i, k], :]
        out_ref[i, :] = acc
        return 0
    jax.lax.fori_loop(0, TN, body, 0)


def run():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (R3, C), jnp.float32)
    ids = jax.random.randint(key, (N, 8), 0, R3, jnp.int32)
    w = jax.random.uniform(key, (N, 8), jnp.float32)

    g1 = pl.pallas_call(
        gather_kernel,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((TN, 8), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R3, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
    )
    g8 = pl.pallas_call(
        devox8_kernel,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((TN, 8), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TN, 8), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R3, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
    )

    results = {}

    def bench(name, fn, *args, iters=10):
        try:
            o = fn(*args)
            # correctness spot-check vs XLA
            if name == "pallas_gather":
                want = jnp.take(table, ids[:, 0], axis=0)
                err = float(jnp.max(jnp.abs(o - want)))
                print(f"  {name} max err vs XLA: {err}", flush=True)
            t0 = time.perf_counter()
            for _ in range(iters):
                o = fn(*args)
            float(jnp.sum(o))
            ms = (time.perf_counter() - t0) / iters * 1e3
            results[name] = ms
            print(f"{name}: {ms:.2f} ms", flush=True)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    bench("pallas_gather", jax.jit(lambda i, t: g1(i, t)), ids, table)
    bench("pallas_devox8", jax.jit(lambda i, w_, t: g8(i, w_, t)), ids, w,
          table)
    bench("xla_take", jax.jit(lambda t, i: jnp.take(t, i[:, 0], axis=0)),
          table, ids)

    def xla8(t, i, w_):
        g = jnp.take(t, i.reshape(-1), axis=0).reshape(N, 8, C)
        return jnp.sum(g * w_[..., None], axis=1)
    bench("xla_devox8", jax.jit(xla8), table, ids, w)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    run()
