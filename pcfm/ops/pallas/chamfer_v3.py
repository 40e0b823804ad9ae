"""Pallas chamfer v3: 2-D grid (query tiles x target chunks), running
min/argmin accumulated in the output block, no dynamic slices inside the
kernel (everything blocked through BlockSpecs), plain f32 jnp.dot.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 256
_TM = 2048
_BIG = 1e30


def _kernel(a_ref, bt_ref, b2_ref, dist_ref, idx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dist_ref[:] = jnp.full((_TN, 1), _BIG, jnp.float32)
        idx_ref[:] = jnp.zeros((_TN, 1), jnp.int32)

    ab = jnp.dot(a_ref[:], bt_ref[:],
                 preferred_element_type=jnp.float32)      # (TN, TM)
    score = b2_ref[:] - 2.0 * ab                          # b2 (1, TM)
    cmin = jnp.min(score, axis=1, keepdims=True)          # (TN, 1)
    cidx = jnp.argmin(score, axis=1).astype(jnp.int32)[:, None] + j * _TM
    upd = cmin < dist_ref[:]
    dist_ref[:] = jnp.where(upd, cmin, dist_ref[:])
    idx_ref[:] = jnp.where(upd, cidx, idx_ref[:])


def _directed_v3(a: jax.Array, b: jax.Array, interpret: bool = False):
    n, m = a.shape[0], b.shape[0]
    pad_n = (-n) % _TN
    pad_m = (-m) % _TM
    a_p = jnp.pad(a, ((0, pad_n), (0, 5)))                # (Np, 8)
    bt_p = jnp.pad(b, ((0, pad_m), (0, 5))).T             # (8, Mp)
    b2 = jnp.sum(b * b, axis=-1)
    b2_p = jnp.pad(b2, (0, pad_m), constant_values=_BIG)[None, :]  # (1, Mp)
    np_, mp_ = n + pad_n, m + pad_m

    _, idx = pl.pallas_call(
        _kernel,
        grid=(np_ // _TN, mp_ // _TM),
        in_specs=[
            pl.BlockSpec((_TN, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        ],
        interpret=interpret,
    )(a_p, bt_p, b2_p)
    idx = idx[:n, 0]
    bnn = jnp.take(b, idx, axis=0)
    dist = jnp.sum((a - bnn) ** 2, axis=-1)
    return dist, idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def chamfer_distance_pallas_v3(a: jax.Array, b: jax.Array,
                               interpret: bool = False):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    f = functools.partial(_directed_v3, interpret=interpret)
    d1, i1 = jax.vmap(f)(a, b)
    d2, i2 = jax.vmap(lambda x, y: f(y, x))(a, b)
    return d1, d2, i1, i2
