"""Pallas TPU kernel for Chamfer nearest-neighbour distance (EXPERIMENTAL).

Status: numerically exact (oracle-parity tests pass, compiled + interpret),
but the current Mosaic lowering of the broadcastd difference pattern is
slower than the chunked XLA path in `pcfm.ops.chamfer` (190ms vs 21ms at
8x2048 on v5e), so eval uses the XLA kernel; this stays as the starting
point for a matmul-reformulated kernel.

Design: one grid cell per (TN)-point tile of the query cloud; the target
cloud lives whole in VMEM (20k x 3 fp32 = 240 KB) and is swept in TM-column
chunks.  Distances use the explicit difference form on the VPU — exact fp32
like the reference CUDA kernel (chamfer3D.cu computes diffs directly), so
no dot-trick cancellation — with a running (min, argmin) carried across
chunks (strict `<` keeps the first minimum, matching CUDA tie order).

The wrapper pads clouds to tile multiples with a far-away sentinel point
and vmaps over the batch.  Forward only (eval metric); gradients route
through the pure-XLA `chamfer_distance`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 512          # query tile rows
_TM = 2048         # target chunk columns
_BIG = 1e30


def _chamfer_kernel(a_ref, b_ref, dist_ref, idx_ref):
    a = a_ref[:]                                        # (TN, 3)
    m = b_ref.shape[0]
    num_chunks = m // _TM

    def body(j, carry):
        best, besti = carry
        bc = b_ref[pl.ds(j * _TM, _TM), :]              # (TM, 3)
        d2 = jnp.zeros((_TN, _TM), jnp.float32)
        for d in range(3):
            diff = a[:, d][:, None] - bc[:, d][None, :]
            d2 = d2 + diff * diff
        cmin = jnp.min(d2, axis=1)
        cidx = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * _TM
        upd = cmin < best
        return (jnp.where(upd, cmin, best),
                jnp.where(upd, cidx, besti))

    best0 = jnp.full((_TN,), _BIG, jnp.float32)
    besti0 = jnp.zeros((_TN,), jnp.int32)
    best, besti = jax.lax.fori_loop(0, num_chunks, body, (best0, besti0))
    dist_ref[:] = best[:, None]
    idx_ref[:] = besti[:, None]


def _directed(a: jax.Array, b: jax.Array, interpret: bool = False):
    """a (N,3), b (M,3) -> (dist (N,), idx (N,)) min over b per a-point."""
    n, m = a.shape[0], b.shape[0]
    pad_n = (-n) % _TN
    pad_m = (-m) % _TM
    a_p = jnp.pad(a, ((0, pad_n), (0, 0)))
    b_p = jnp.pad(b, ((0, pad_m), (0, 0)), constant_values=_BIG ** 0.5)
    np_, mp_ = n + pad_n, m + pad_m

    dist, idx = pl.pallas_call(
        _chamfer_kernel,
        grid=(np_ // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp_, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TN, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        ],
        interpret=interpret,
    )(a_p, b_p)
    return dist[:n, 0], idx[:n, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def chamfer_distance_pallas(a: jax.Array, b: jax.Array,
                            interpret: bool = False):
    """Bidirectional Chamfer via the Pallas kernel.

    Args/returns match `pcfm.ops.chamfer.chamfer_distance` (3-D points).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    f = functools.partial(_directed, interpret=interpret)
    d1, i1 = jax.vmap(f)(a, b)
    d2, i2 = jax.vmap(lambda x, y: f(y, x))(a, b)
    return d1, d2, i1, i2
