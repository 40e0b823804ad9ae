"""Pallas chamfer v2: MXU-scored nearest neighbour.

v1 (chamfer_pallas.py) computed the (TN, TM) distance tile with three VPU
broadcast-diff passes, which Mosaic lowers slowly.  v2 scores candidates on
the MXU: ``score = |b|^2 - 2 a.b`` (the |a|^2 term is constant per query
row and drops out of the argmin), with HIGHEST precision so scores equal
the fp32 dot-trick the XLA path uses.  The exact winning distance is
recomputed OUTSIDE the kernel by a tiny gather (same two-pass scheme as
`pcfm.ops.chamfer.chamfer_distance`).
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


def _f32_matmul_bf16x3(a_hi, a_lo, b_hi, b_lo):
    """fp32-accurate product from bf16 split operands (3-pass trick):
    a ~ a_hi + a_lo, b ~ b_hi + b_lo ->
    ab ~ hi@hi + hi@lo + lo@hi (the lo@lo term is below fp32 ulp)."""
    acc = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    acc += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return acc


def _argmin_kernel(a_ref, bt_ref, b2_ref, dist_ref, idx_ref):
    # a: (TN, 8) padded xyz; bt: (8, M) pre-transposed target coords
    a = a_ref[:]
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    m = bt_ref.shape[1]
    num_chunks = m // _TM

    def body(j, carry):
        best, besti = carry
        bt = bt_ref[:, pl.ds(j * _TM, _TM)]            # (8, TM)
        bt_hi = bt.astype(jnp.bfloat16)
        bt_lo = (bt - bt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b2c = b2_ref[pl.ds(j * _TM, _TM), 0]           # (TM,)
        ab = _f32_matmul_bf16x3(a_hi, a_lo, bt_hi, bt_lo)   # (TN, TM)
        score = b2c[None, :] - 2.0 * ab
        cmin = jnp.min(score, axis=1)
        cidx = jnp.argmin(score, axis=1).astype(jnp.int32) + j * _TM
        upd = cmin < best
        return (jnp.where(upd, cmin, best), jnp.where(upd, cidx, besti))

    best0 = jnp.full((_TN,), _BIG, jnp.float32)
    besti0 = jnp.zeros((_TN,), jnp.int32)
    best, besti = jax.lax.fori_loop(0, num_chunks, body, (best0, besti0))
    dist_ref[:] = best[:, None]
    idx_ref[:] = besti[:, None]


def _directed_v2(a: jax.Array, b: jax.Array, interpret: bool = False):
    """a (N,3), b (M,3) -> (exact min dist (N,), argmin idx (N,))."""
    n, m = a.shape[0], b.shape[0]
    pad_n = (-n) % _TN
    pad_m = (-m) % _TM
    # pad the 3-wide coords to 8 lanes for clean MXU tiles
    a_p = jnp.pad(a, ((0, pad_n), (0, 5)))
    bt_p = jnp.pad(b, ((0, pad_m), (0, 5)), constant_values=0.0).T  # (8, M)
    # padded b rows get |b|^2 = BIG so they never win
    b2 = jnp.sum(b * b, axis=-1)
    b2_p = jnp.pad(b2, (0, pad_m), constant_values=_BIG)[:, None]
    np_, mp_ = n + pad_n, m + pad_m

    _, idx = pl.pallas_call(
        _argmin_kernel,
        grid=(np_ // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, mp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp_, 1), lambda i: (0, 0),
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
    )(a_p, bt_p, b2_p)
    idx = idx[:n, 0]
    # exact distance of the winner (difference form, like the CUDA kernel)
    bnn = jnp.take(b, idx, axis=0)
    dist = jnp.sum((a - bnn) ** 2, axis=-1)
    return dist, idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def chamfer_distance_pallas_v2(a: jax.Array, b: jax.Array,
                               interpret: bool = False):
    """Bidirectional chamfer, MXU-scored Pallas argmin + exact refine."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    f = functools.partial(_directed_v2, interpret=interpret)
    d1, i1 = jax.vmap(f)(a, b)
    d2, i2 = jax.vmap(lambda x, y: f(y, x))(a, b)
    return d1, d2, i1, i2
