"""3-nearest-neighbor interpolation — TPU-native.

Port of `third_party/pvcnn/modules/functional/src/interpolate/
neighbor_interpolate.cu:20-181`: for each point, find its 3 nearest centers
(insertion scan -> strict-less comparisons keep the earlier index on ties,
which ``jax.lax.top_k`` also does) and blend their features with
inverse-squared-distance weights; distances are clamped to [1e-10, 1e10]
exactly as the kernel does.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pcfm.ops.chamfer import pairwise_sqdist


def three_nn(points: jax.Array, centers: jax.Array):
    """(B,N,3), (B,M,3) -> (dists (B,N,3), indices (B,N,3) int32), the 3
    smallest squared distances per point (ascending)."""
    d2 = pairwise_sqdist(points, centers)                           # (B,N,M)
    neg, idx = jax.lax.top_k(-d2, 3)
    return -neg, idx.astype(jnp.int32)


def three_nn_weights(d2: jax.Array) -> jax.Array:
    """Inverse-squared-distance weights with the reference clamps."""
    d = jnp.clip(d2.astype(jnp.float32), 1e-10, 1e10)
    d0, d1, d2_ = d[..., 0], d[..., 1], d[..., 2]
    d0d1, d0d2, d1d2 = d0 * d1, d0 * d2_, d1 * d2_
    inv = 1.0 / (d0d1 + d0d2 + d1d2)
    return jnp.stack([d1d2 * inv, d0d2 * inv, d0d1 * inv], axis=-1)


def nearest_neighbor_interpolate(points: jax.Array, centers: jax.Array,
                                 centers_features: jax.Array) -> jax.Array:
    """Interpolate center features onto points.

    Args:
      points: (B, N, 3); centers: (B, M, 3); centers_features: (B, M, C).
    Returns:
      (B, N, C).  Gradient flows to ``centers_features`` only (the reference
      backward returns None for both coordinate inputs).
    """
    d2, idx = three_nn(jax.lax.stop_gradient(points),
                       jax.lax.stop_gradient(centers))
    w = three_nn_weights(d2)                                        # (B,N,3)
    b, n, _ = idx.shape
    gathered = jnp.take_along_axis(
        centers_features, idx.reshape(b, n * 3, 1), axis=1
    ).reshape(b, n, 3, -1)
    return jnp.sum(gathered * w[..., None], axis=2)
