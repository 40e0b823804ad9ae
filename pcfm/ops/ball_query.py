"""Ball query + grouping — TPU-native.

Port of `third_party/pvcnn/modules/functional/src/ball_query/ball_query.cu`
and `src/grouping/grouping.cu`.

The CUDA ball query walks points in index order and keeps the first <= U
hits within radius; the first hit back-fills every slot, and centers with no
hit keep index 0.  On TPU we reproduce the exact order semantics with a
top-k over order keys: ``key = k if hit else N + k`` — the U smallest keys
are the first U hits in order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pcfm.ops.chamfer import pairwise_sqdist


@functools.partial(jax.jit, static_argnames=("radius", "num_neighbors"))
def ball_query(centers: jax.Array, points: jax.Array, radius: float,
               num_neighbors: int) -> jax.Array:
    """First-K-within-radius neighbor indices.

    Args:
      centers: (B, M, 3) query centers.
      points: (B, N, 3) points.
      radius: ball radius (compared against squared distance < r^2).
      num_neighbors: U, max neighbors per center.
    Returns:
      (B, M, U) int32 indices, with the reference's back-fill semantics.
    """
    b, m, _ = centers.shape
    n = points.shape[1]
    u = int(num_neighbors)
    d2 = pairwise_sqdist(centers, points)                           # (B,M,N)
    hit = d2 < float(radius) ** 2
    order = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(hit, order[None, None, :], order[None, None, :] + n)
    neg_topk, _ = jax.lax.top_k(-key, u)                            # (B,M,U)
    key_u = -neg_topk
    valid = key_u < n
    idx = jnp.where(valid, key_u, 0)
    # back-fill: slots past the hit count get the first hit; no hits -> 0
    first = idx[..., :1]
    any_hit = valid[..., :1]
    idx = jnp.where(valid, idx, jnp.where(any_hit, first, 0))
    return idx.astype(jnp.int32)


def grouping(features: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather neighbor features.

    Args:
      features: (B, N, C).
      indices: (B, M, U) int.
    Returns:
      (B, M, U, C) — channel-last version of the reference's (B, C, M, U)
      (grouping.cu:18-85); backward scatter-add comes from autodiff.
    """
    bsz, m, u = indices.shape
    flat = indices.reshape(bsz, m * u)
    out = jnp.take_along_axis(features, flat[..., None], axis=1)
    return out.reshape(bsz, m, u, features.shape[-1])
