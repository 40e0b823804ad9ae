"""Approximate Earth Mover's Distance (Fan/Mo approxmatch) — TPU-native.

Faithful re-derivation of the reference CUDA kernel
(`third_party/PyTorchEMD/cuda/emd_kernel.cu:24-353`): 10 rounds of a
Sinkhorn-like soft assignment with temperature schedule ``level = -4^j`` for
``j = 7..-1`` and a final hard level 0 round, followed by
``cost = sum(match * d^2)``.  The python wrapper divides by N
(`PyTorchEMD/emd.py:27-51`).

On TPU every inner step is a (N, M) elementwise-exp plus a matvec — all
MXU/VPU shaped and fused by XLA inside one `lax.fori_loop`.  The (B, M, N)
match matrix is materialized exactly as in the CUDA kernel
(emd_kernel.cu:182), so callers should cap point counts (<= ~4k) for eval,
as typical usage of the reference does.

Gradients use the analytic formulas of matchcostgrad1/2
(emd_kernel.cu:285-353) via ``jax.custom_vjp`` — the match matrix is
treated as constant, matching the reference autograd Function.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pcfm.ops.chamfer import pairwise_sqdist


def approxmatch(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Compute the (B, M, N) soft match matrix between xyz1 (B,N,3) and
    xyz2 (B,M,3), matching approxmatch (emd_kernel.cu:24-156)."""
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    # integer-division multiplicities, exactly as the C++ (ints n, m)
    if n >= m:
        mult_l, mult_r = 1.0, float(n // m)
    else:
        mult_l, mult_r = float(m // n), 1.0

    d2 = pairwise_sqdist(xyz1, xyz2)                                # (B,N,M)

    levels = jnp.array([-float(4.0 ** j) for j in range(7, -2, -1)] + [0.0],
                       dtype=jnp.float32)                           # 10 levels

    def body(i, state):
        match, remain_l, remain_r = state
        level = levels[i]
        w = jnp.exp(level * d2)                                     # (B,N,M)
        # step 1: ratioL_k = remainL_k / (1e-9 + sum_l w_kl * remainR_l)
        suml = 1e-9 + jnp.einsum("bnm,bm->bn", w, remain_r,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        ratio_l = remain_l / suml                                   # (B,N)
        # step 2: sumr_l = remainR_l * sum_k w_kl * ratioL_k
        sumr = jnp.einsum("bnm,bn->bm", w, ratio_l,
                          preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r                            # (B,M)
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        # step 3: match_lk += w_kl * ratioL_k * ratioR_l
        delta = w * ratio_l[:, :, None] * ratio_r[:, None, :]       # (B,N,M)
        match = match + delta
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(delta, axis=2))
        return match, remain_l, remain_r

    match0 = jnp.zeros((b, n, m), jnp.float32)
    remain_l0 = jnp.full((b, n), mult_l, jnp.float32)
    remain_r0 = jnp.full((b, m), mult_r, jnp.float32)
    match, _, _ = jax.lax.fori_loop(0, 10, body, (match0, remain_l0, remain_r0))
    # reference layout is (B, M, N)
    return jnp.swapaxes(match, 1, 2)


def matchcost(xyz1: jax.Array, xyz2: jax.Array, match: jax.Array) -> jax.Array:
    """cost_b = sum_{l,k} match[b,l,k] * d2(xyz1[b,k], xyz2[b,l])  -> (B,)."""
    d2 = pairwise_sqdist(xyz1, xyz2)                                # (B,N,M)
    return jnp.einsum("bnm,bmn->b", d2, match,
                      preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)


@jax.custom_vjp
def _emd_cost(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    match = approxmatch(xyz1, xyz2)
    return matchcost(xyz1, xyz2, match)


def _emd_fwd(xyz1, xyz2):
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)
    match = approxmatch(xyz1, xyz2)
    return matchcost(xyz1, xyz2, match), (xyz1, xyz2, match)


def _emd_bwd(res, g):
    xyz1, xyz2, match = res
    # matchcostgrad1: d cost / d xyz1[k] = sum_l 2 * match[l,k] * (x1_k - x2_l)
    # matchcostgrad2: d cost / d xyz2[l] = sum_k 2 * match[l,k] * (x2_l - x1_k)
    w = jnp.swapaxes(match, 1, 2)                                   # (B,N,M)
    wsum1 = jnp.sum(w, axis=2, keepdims=True)                       # (B,N,1)
    wsum2 = jnp.sum(w, axis=1)[..., None]                           # (B,M,1)
    wx2 = jnp.einsum("bnm,bmd->bnd", w, xyz2,
                     preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    wx1 = jnp.einsum("bnm,bnd->bmd", w, xyz1,
                     preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    g1 = 2.0 * (xyz1 * wsum1 - wx2) * g[:, None, None]
    g2 = 2.0 * (xyz2 * wsum2 - wx1) * g[:, None, None]
    return g1, g2


_emd_cost.defvjp(_emd_fwd, _emd_bwd)


@functools.partial(jax.jit)
def earth_mover_distance(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Approximate EMD, normalized by N like the reference wrapper
    (`PyTorchEMD/emd.py:27-51`).

    Args:
      xyz1, xyz2: (B, N, 3) / (B, M, 3) point clouds (BNC layout).
    Returns:
      (B,) per-batch cost / N.
    """
    if xyz1.ndim == 2:
        xyz1 = xyz1[None]
    if xyz2.ndim == 2:
        xyz2 = xyz2[None]
    n = xyz1.shape[1]
    return _emd_cost(xyz1, xyz2) / float(n)


# ---------------------------------------------------------------------------
# Streamed O(N+M)-memory formulation.
#
# Key observation about approxmatch: the (M, N) match matrix is a SUM of
# per-level rank-structured terms
#     match = sum_lev exp(level * d2) ∘ (ratioL_lev ⊗ ratioR_lev)
# where the cross-level coupling flows only through the remainL / remainR
# marginal vectors.  So the algorithm needs only (N,)- and (M,)-vectors of
# state, with every (N, M) interaction recomputed in tiles — the match
# matrix never exists.  This scales the evaluation to 20k+ points where the
# reference CUDA kernel materializes 8 x 20k x 20k fp32 = 12.8 GB
# (emd_kernel.cu:182) and OOMs.
# ---------------------------------------------------------------------------


def _chunked_exp_matvec(x1, x2, level, vec_m, chunk):
    """sum_l exp(level*d2[:, l]) * vec_m[l] per row, streaming M-chunks.
    x1 (N,3), x2 (M,3), vec_m (M,) -> (N,)."""
    m = x2.shape[0]
    nchunk = m // chunk

    def body(carry, args):
        xc, vc = args
        d2 = (jnp.sum(x1 * x1, -1)[:, None] + jnp.sum(xc * xc, -1)[None, :]
              - 2.0 * jnp.einsum("nd,md->nm", x1, xc,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST))
        w = jnp.exp(level * jnp.maximum(d2, 0.0))
        return carry + w @ vc, None

    x2c = x2.reshape(nchunk, chunk, 3)
    vmc = vec_m.reshape(nchunk, chunk)
    out, _ = jax.lax.scan(body, jnp.zeros(x1.shape[0], jnp.float32),
                          (x2c, vmc))
    return out


def _emd_streamed_one(x1, x2, chunk):
    """Per-cloud streamed approxmatch cost.  x1 (N,3), x2 (M,3) with N, M
    multiples of `chunk`.  Returns cost (scalar)."""
    n, m = x1.shape[0], x2.shape[0]
    if n >= m:
        mult_l, mult_r = 1.0, float(n // m)
    else:
        mult_l, mult_r = float(m // n), 1.0
    levels = jnp.array([-float(4.0 ** j) for j in range(7, -2, -1)] + [0.0],
                       dtype=jnp.float32)

    def level_step(state, level):
        remain_l, remain_r = state
        suml = 1e-9 + _chunked_exp_matvec(x1, x2, level, remain_r, chunk)
        ratio_l = remain_l / suml
        sumr = _chunked_exp_matvec(x2, x1, level, ratio_l, chunk) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        new_remain_r = jnp.maximum(0.0, remain_r - sumr)
        # delta row-sums for remainL: sum_l w * ratio_l * ratio_r
        delta_rows = ratio_l * _chunked_exp_matvec(x1, x2, level, ratio_r,
                                                   chunk)
        new_remain_l = jnp.maximum(0.0, remain_l - delta_rows)
        return (new_remain_l, new_remain_r), (ratio_l, ratio_r)

    init = (jnp.full((n,), mult_l, jnp.float32),
            jnp.full((m,), mult_r, jnp.float32))
    _, (rls, rrs) = jax.lax.scan(level_step, init, levels)

    # cost = sum_{k,l} d2 * match = sum_lev sum_{k,l} d2 * w * rL_k * rR_l
    def cost_chunk(carry, args):
        xc, rr_c = args                              # (chunk,3), (10,chunk)
        d2 = (jnp.sum(x1 * x1, -1)[:, None] + jnp.sum(xc * xc, -1)[None, :]
              - 2.0 * jnp.einsum("nd,md->nm", x1, xc,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST))
        d2 = jnp.maximum(d2, 0.0)
        acc = carry
        for lev in range(10):
            w = jnp.exp(levels[lev] * d2)
            acc = acc + jnp.sum((rls[lev][:, None] * w * rr_c[lev][None, :])
                                * d2)
        return acc, None

    x2c = x2.reshape(m // chunk, chunk, 3)
    rrc = jnp.moveaxis(rrs.reshape(10, m // chunk, chunk), 1, 0)
    cost, _ = jax.lax.scan(cost_chunk, jnp.float32(0.0), (x2c, rrc))
    return cost, rls, rrs


def _streamed_match_moments(x1, x2, rls, rrs, levels, chunk):
    """Streaming row/column sums of match and match-weighted coordinates:
    rowsum (N,), colsum (M,), wx2 (N,3) = sum_l match_lk x2_l,
    wx1 (M,3) = sum_k match_lk x1_k — everything the analytic EMD gradients
    (matchcostgrad1/2) need, without the (N, M) match."""
    n, m = x1.shape[0], x2.shape[0]

    def chunk_step(carry, args):
        rowsum, wx2 = carry
        xc, rr_c = args                              # (chunk,3), (10,chunk)
        d2 = (jnp.sum(x1 * x1, -1)[:, None] + jnp.sum(xc * xc, -1)[None, :]
              - 2.0 * jnp.einsum("nd,md->nm", x1, xc,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST))
        d2 = jnp.maximum(d2, 0.0)
        match_c = jnp.zeros_like(d2)                 # (N, chunk)
        for lev in range(10):
            match_c = match_c + jnp.exp(levels[lev] * d2) \
                * rls[lev][:, None] * rr_c[lev][None, :]
        rowsum = rowsum + jnp.sum(match_c, axis=1)
        wx2 = wx2 + match_c @ xc
        colsum_c = jnp.sum(match_c, axis=0)
        wx1_c = match_c.T @ x1
        return (rowsum, wx2), (colsum_c, wx1_c)

    x2c = x2.reshape(m // chunk, chunk, 3)
    rrc = jnp.moveaxis(rrs.reshape(10, m // chunk, chunk), 1, 0)
    (rowsum, wx2), (colsum_c, wx1_c) = jax.lax.scan(
        chunk_step, (jnp.zeros(n, jnp.float32), jnp.zeros((n, 3),
                                                          jnp.float32)),
        (x2c, rrc))
    return rowsum, wx2, colsum_c.reshape(m), wx1_c.reshape(m, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _emd_streamed_cost(xyz1, xyz2, chunk):
    f = functools.partial(_emd_streamed_one, chunk=chunk)
    cost, _, _ = jax.vmap(f)(xyz1, xyz2)
    return cost


def _emd_streamed_fwd(xyz1, xyz2, chunk):
    f = functools.partial(_emd_streamed_one, chunk=chunk)
    cost, rls, rrs = jax.vmap(f)(xyz1, xyz2)
    return cost, (xyz1, xyz2, rls, rrs)


def _emd_streamed_bwd(chunk, res, g):
    xyz1, xyz2, rls, rrs = res
    levels = jnp.array([-float(4.0 ** j) for j in range(7, -2, -1)] + [0.0],
                       dtype=jnp.float32)

    def one(x1, x2, rl, rr):
        return _streamed_match_moments(x1, x2, rl, rr, levels, chunk)

    rowsum, wx2, colsum, wx1 = jax.vmap(one)(xyz1, xyz2, rls, rrs)
    # matchcostgrad1/2 (emd_kernel.cu:285-353), streaming form
    g1 = 2.0 * (xyz1 * rowsum[..., None] - wx2) * g[:, None, None]
    g2 = 2.0 * (xyz2 * colsum[..., None] - wx1) * g[:, None, None]
    return g1, g2


_emd_streamed_cost.defvjp(_emd_streamed_fwd, _emd_streamed_bwd)


@functools.partial(jax.jit, static_argnames=("chunk",))
def earth_mover_distance_streamed(xyz1: jax.Array, xyz2: jax.Array,
                                  chunk: int = 2048) -> jax.Array:
    """O(N+M)-memory approxmatch EMD for large clouds (20k+ points).

    Same semantics as ``earth_mover_distance`` up to fp summation order,
    INCLUDING analytic gradients (streamed match moments), so EMD is usable
    as a training loss at sizes where the reference kernel OOMs.  N and M
    must be divisible by `chunk` (padding would bias the match) — callers
    subsample to a round size.
    """
    if xyz1.ndim == 2:
        xyz1 = xyz1[None]
    if xyz2.ndim == 2:
        xyz2 = xyz2[None]
    n, m = xyz1.shape[1], xyz2.shape[1]
    chunk = min(chunk, n, m)
    assert n % chunk == 0 and m % chunk == 0, \
        f"streamed EMD needs N, M divisible by chunk={chunk}"
    cost = _emd_streamed_cost(xyz1.astype(jnp.float32),
                              xyz2.astype(jnp.float32), chunk)
    return cost / float(n)
