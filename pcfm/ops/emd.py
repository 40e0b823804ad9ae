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
