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

    dists0 = jnp.full((b, n), jnp.inf, jnp.float32)
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


def logits_mask(coords: jax.Array, logits: jax.Array,
                num_points_per_object: int, key: jax.Array):
    """Sample points predicted positive by binary logits (reference
    ``logits_mask``, functional/sampling.py:52-85, used by the frustum
    pipeline).

    Args:
      coords: (B, N, 3) point coordinates (channel-last).
      logits: (B, N, 2) binary classification logits per point.
      num_points_per_object: M points to select per cloud.
      key: PRNG key (the reference uses np.random; selection here is
        functional).
    Returns:
      (selected (B, M, 3) mean-centered masked coords, mean (B, 3),
      mask (B, N) bool).  When a cloud has fewer than M positives, positives
      are repeated (reference tiling semantics); with zero positives the
      selection degenerates to index 0 of the zeroed coords (matching the
      reference's all-zero selected_indices).
    """
    b, n, _ = coords.shape
    m = int(num_points_per_object)
    mask = logits[..., 0] < logits[..., 1]                          # (B, N)
    num_candidates = jnp.sum(mask, axis=-1, keepdims=True)          # (B, 1)
    masked_coords = coords * mask[..., None]
    mean = (jnp.sum(masked_coords, axis=1)
            / jnp.maximum(num_candidates, 1).astype(coords.dtype))  # (B, 3)

    def select_one(k, mask_b):
        cnt = jnp.sum(mask_b)
        # candidate indices ordered first (stable), padding after
        order = jnp.argsort(~mask_b, stable=True).astype(jnp.int32)
        k1, k2 = jax.random.split(k)
        # random permutation of the cnt candidate slots (random scores,
        # +inf on padding); tiling the permutation repeats candidates
        # only when cnt < M — matching the reference's replace=False
        # draw + floor/remainder repetition (sampling.py:73-81; review:
        # randint sampled WITH replacement even when cnt >= M)
        scores = jnp.where(jnp.arange(mask_b.shape[0]) < cnt,
                           jax.random.uniform(k1, mask_b.shape), jnp.inf)
        perm_slots = jnp.argsort(scores).astype(jnp.int32)
        take = perm_slots[jnp.arange(m) % jnp.maximum(cnt, 1)]
        take = jax.random.permutation(k2, take)     # reference shuffles
        return jnp.where(cnt > 0, order[take], 0)

    keys = jax.random.split(key, b)
    sel = jax.vmap(select_one)(keys, mask)                          # (B, M)
    selected = gather(masked_coords - mean[:, None, :], sel)
    return selected, mean, mask
