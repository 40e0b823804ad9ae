"""Furthest point sampling + gather — TPU-native.

Port of the reference CUDA kernel semantics
(`third_party/pvcnn/modules/functional/src/sampling/sampling.cu:86-167`):
iterative FPS with the first index fixed to 0, maintaining per-point
min-distance-to-set and taking the argmax each round.  ``jnp.argmax`` picks
the first maximal index, which matches the CUDA tree-reduction's
lowest-index preference for ties.

This is inherently sequential in the number of samples M; each round is a
(B, N) vector op so the whole loop stays on the VPU under one jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_samples",))
def furthest_point_sample_indices(coords: jax.Array,
                                  num_samples: int) -> jax.Array:
    """(B, N, 3) float -> (B, M) int32 sampled indices (first is 0)."""
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    b, n, _ = coords.shape
    m = int(num_samples)

    def body(j, state):
        dists, idxs, last = state
        p = jnp.take_along_axis(coords, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((coords - p) ** 2, axis=-1)                       # (B,N)
        dists = jnp.minimum(dists, d)
        best = jnp.argmax(dists, axis=1).astype(jnp.int32)            # (B,)
        idxs = idxs.at[:, j].set(best)
        return dists, idxs, best

    dists0 = jnp.full((b, n), 1e40, jnp.float32)
    idxs0 = jnp.zeros((b, m), jnp.int32)
    last0 = jnp.zeros((b,), jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(1, m, body, (dists0, idxs0, last0))
    return idxs


def gather(features: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather per-point features by index.

    Args:
      features: (B, N, C).
      indices: (B, M) int.
    Returns:
      (B, M, C).  Backward is a deterministic scatter-add via autodiff
      (reference: sampling.cu:17-74).
    """
    return jnp.take_along_axis(features, indices[..., None].astype(jnp.int32),
                               axis=1)


def furthest_point_sample(coords: jax.Array, num_samples: int) -> jax.Array:
    """(B, N, 3) -> (B, M, 3) sampled center coordinates (reference
    ``furthest_point_sample``, functional/sampling.py:37-49)."""
    idx = furthest_point_sample_indices(coords, num_samples)
    return gather(coords, idx)
