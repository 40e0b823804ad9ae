"""Fused FiLM residual block — the velocity-net trunk hot path.

One trunk block (reference models.py:62-79 FiLMBlock + models.py:137-146
residual) is

    u    = LayerNorm(h; s, t)            # eps 1e-5, learned affine
    f    = u * (1 + gamma) + beta        # FiLM from the (B, E) embedding
    y    = f + silu(f) @ W + b           # residual MLP

XLA runs this as ~8 HBM passes over the (B*N, C) activations per block
(LN stats, LN apply, FiLM, silu, GEMM, and in backward separate
reduce-fusions for db, dgamma/dbeta, ds/dt — measured ~12 ms of the 20 ms
mlp step at B=8 N=20k C=512 on v5e).  This kernel does the whole block in
ONE pass per direction:

  * forward: read h tile -> LN stats on the VPU -> FiLM -> silu -> one
    (R, C) x (C, C) MXU dot -> write y (+ per-row mean/rstd residuals);
  * backward: read h + dy tile, recompute f from the saved stats, two MXU
    dots (dy @ W^T and silu(f)^T @ dy), and ALL small gradients (dW, db,
    dgamma, dbeta, ds, dt) accumulate in VMEM across the point axis —
    no separate activation-sized reductions ever hit HBM.

Weights stay f32; activations compute in f32 on tiles decoded from the
input dtype; the dots run DEFAULT precision (bf16 multiplies, f32
accumulate) like the rest of the model path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DOT_PRECISION = jax.lax.Precision.DEFAULT
_VMEM_LIMIT = 100 * 2 ** 20

R = 256          # rows (points) per tile
LN_EPS = 1e-5


def _cdiv(a, b):
    return -(-a // b)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _ln(h32, s, t, mean, rstd):
    xhat = (h32 - mean) * rstd
    return xhat, xhat * s + t


def _fwd_kernel(h_ref, s_ref, t_ref, g_ref, be_ref, w_ref, b_ref,
                y_ref, mean_ref, rstd_ref):
    h32 = h_ref[0].astype(jnp.float32)                     # (R, C)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    _, u = _ln(h32, s_ref[0][None, :], t_ref[0][None, :], mean, rstd)
    f = u * (1.0 + g_ref[0, 0][None, :].astype(jnp.float32)) \
        + be_ref[0, 0][None, :].astype(jnp.float32)
    p = _silu(f)
    y = f + jax.lax.dot_general(
        p, w_ref[...], (((1,), (0,)), ((), ())),
        precision=DOT_PRECISION,
        preferred_element_type=jnp.float32) + b_ref[0][None, :]
    y_ref[0] = y.astype(y_ref.dtype)
    mean_ref[0] = mean                                     # (R, 1)
    rstd_ref[0] = rstd


def _bwd_kernel(dy_ref, h_ref, s_ref, t_ref, g_ref, be_ref, w_ref, wt_ref,
                mean_ref, rstd_ref,
                dh_ref, dw_ref, db_ref, dg_ref, dbe_ref, ds_ref, dt_ref):
    b = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, ti == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        ds_ref[...] = jnp.zeros_like(ds_ref)
        dt_ref[...] = jnp.zeros_like(dt_ref)

    @pl.when(ti == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)

    h32 = h_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    s = s_ref[0][None, :]
    gamma = g_ref[0, 0][None, :].astype(jnp.float32)
    mean = mean_ref[0]                                     # (R, 1)
    rstd = rstd_ref[0]
    xhat, u = _ln(h32, s, t_ref[0][None, :], mean, rstd)
    f = u * (1.0 + gamma) + be_ref[0, 0][None, :].astype(jnp.float32)
    sig = jax.nn.sigmoid(f)
    p = f * sig                                            # silu(f)

    dp = jax.lax.dot_general(dy, wt_ref[...], (((1,), (0,)), ((), ())),
                             precision=DOT_PRECISION,
                             preferred_element_type=jnp.float32)
    df = dy + sig * (1.0 + f * (1.0 - sig)) * dp

    dw_ref[...] += jax.lax.dot_general(
        p, dy, (((0,), (0,)), ((), ())), precision=DOT_PRECISION,
        preferred_element_type=jnp.float32)
    db_ref[0] += jnp.sum(dy, axis=0)
    dg_ref[0, 0] += jnp.sum(df * u, axis=0)
    dbe_ref[0, 0] += jnp.sum(df, axis=0)

    du = df * (1.0 + gamma)
    ds_ref[0] += jnp.sum(du * xhat, axis=0)
    dt_ref[0] += jnp.sum(du, axis=0)

    dxhat = du * s
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dh_ref[0] = (rstd * (dxhat - m1 - xhat * m2)).astype(dh_ref.dtype)


def _pad_rows(x, n_pad):
    pad = n_pad - x.shape[1]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def film_block(h, s, t, gamma, beta, w, b, interpret: bool = False):
    """Fused trunk block: LayerNorm(s,t) -> FiLM(gamma,beta) -> residual
    silu-Dense(w,b).  h (B,N,C); s,t,b (C,); gamma,beta (B,C); w (C,C).
    Returns (B,N,C) in h.dtype.  C must be a multiple of 128."""
    y, _ = _film_fwd_impl(h, s, t, gamma, beta, w, b, interpret)
    return y


def _film_fwd_impl(h, s, t, gamma, beta, w, b, interpret):
    bsz, n, c = h.shape
    assert c % 128 == 0, f"film_block needs C % 128 == 0, got {c}"
    n_pad = _cdiv(n, R) * R
    hp = _pad_rows(h, n_pad)
    nt = n_pad // R
    # blocks of (B, 1, C)/(B, N, 1) shaped operands: the last two dims of
    # every block equal the array dims or are (8, 128)-aligned (TPU rule)
    r1c = lambda bi, ti: (0, 0)                    # noqa: E731
    bc = lambda bi, ti: (bi, 0, 0)                 # noqa: E731
    y, mean, rstd = pl.pallas_call(
        _fwd_kernel,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, R, c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, c), r1c),
            pl.BlockSpec((1, c), r1c),
            pl.BlockSpec((1, 1, c), bc),
            pl.BlockSpec((1, 1, c), bc),
            pl.BlockSpec((c, c), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, c), r1c),
        ],
        out_specs=[
            pl.BlockSpec((1, R, c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, R, 1), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, R, 1), lambda bi, ti: (bi, ti, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_pad, c), h.dtype),
            jax.ShapeDtypeStruct((bsz, n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(hp, s.reshape(1, c), t.reshape(1, c), gamma[:, None, :],
      beta[:, None, :], w, b.reshape(1, c))
    return y[:, :n], (hp, mean, rstd)


def _film_fwd(h, s, t, gamma, beta, w, b, interpret):
    y, (hp, mean, rstd) = _film_fwd_impl(h, s, t, gamma, beta, w, b,
                                         interpret)
    return y, (hp, s, t, gamma, beta, w, mean, rstd)


def _film_bwd(interpret, res, dy):
    hp, s, t, gamma, beta, w, mean, rstd = res
    bsz, n_pad, c = hp.shape
    n = dy.shape[1]
    nt = n_pad // R
    dyp = _pad_rows(dy.astype(hp.dtype), n_pad)    # zero rows -> zero grads
    r1c = lambda bi, ti: (0, 0)                    # noqa: E731
    bc = lambda bi, ti: (bi, 0, 0)                 # noqa: E731
    blk = lambda bi, ti: (bi, ti, 0)               # noqa: E731
    dh, dw, db, dg, dbe, ds, dt = pl.pallas_call(
        _bwd_kernel,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, R, c), blk),
            pl.BlockSpec((1, R, c), blk),
            pl.BlockSpec((1, c), r1c),
            pl.BlockSpec((1, c), r1c),
            pl.BlockSpec((1, 1, c), bc),
            pl.BlockSpec((1, 1, c), bc),
            pl.BlockSpec((c, c), lambda bi, ti: (0, 0)),
            pl.BlockSpec((c, c), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, R, 1), blk),
            pl.BlockSpec((1, R, 1), blk),
        ],
        out_specs=[
            pl.BlockSpec((1, R, c), blk),
            pl.BlockSpec((c, c), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, c), r1c),
            pl.BlockSpec((1, 1, c), bc),
            pl.BlockSpec((1, 1, c), bc),
            pl.BlockSpec((1, c), r1c),
            pl.BlockSpec((1, c), r1c),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_pad, c), hp.dtype),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(dyp, hp, s.reshape(1, c), t.reshape(1, c), gamma[:, None, :],
      beta[:, None, :], w, w.T, mean, rstd)
    return (dh[:, :n], ds[0].astype(s.dtype), dt[0].astype(t.dtype),
            dg[:, 0].astype(gamma.dtype), dbe[:, 0].astype(beta.dtype),
            dw.astype(w.dtype), db[0].astype(w.dtype))


film_block.defvjp(_film_fwd, _film_bwd)


def film_block_reference(h, s, t, gamma, beta, w, b):
    """Unfused reference (same math, plain jnp) for parity tests."""
    h32 = h.astype(jnp.float32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    xhat = (h32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    u = xhat * s + t
    f = u * (1.0 + gamma[:, None, :].astype(jnp.float32)) \
        + beta[:, None, :].astype(jnp.float32)
    y = f + _silu(f) @ w + b
    return y.astype(h.dtype)
