"""Chamfer distance (any point dimension) — TPU-native.

Re-design of the reference CUDA kernels
(`third_party/ChamferDistancePytorch/chamfer{2,3,5,6}D/*.cu`) and the
double-precision python oracle (`chamfer_python.py:18-43`).

The CUDA kernel tiles B x N x M into shared memory and computes squared
differences directly.  On TPU the pairwise term is MXU-shaped:
``d2 = |a|^2 + |b|^2 - 2 a.b`` with the cross term as a batched matmul,
chunked over the first cloud so 20k x 20k never materializes at once.
Differences from the reference:
  * deterministic (no atomicAdd in the backward — autodiff of the min-gather
    is a deterministic scatter);
  * works for any D (the reference templates 2/3/5/6).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """(B,N,D), (B,M,D) -> (B,N,M) squared L2 distances (clamped >= 0)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1)                                    # (B,N)
    b2 = jnp.sum(b * b, axis=-1)                                    # (B,M)
    # HIGHEST precision: on TPU the default MXU path multiplies in bf16,
    # which is far outside the 1e-4 parity gate for distance kernels
    cross = jnp.einsum("bnd,bmd->bnm", a, b,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    d2 = a2[:, :, None] + b2[:, None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


@functools.partial(jax.jit, static_argnames=("chunk",))
def chamfer_distance(a: jax.Array, b: jax.Array, chunk: int = 4096):
    """Bidirectional nearest-neighbour squared-L2 Chamfer distance.

    Args:
      a: (B, N, D) first clouds.
      b: (B, M, D) second clouds.
      chunk: chunk size along N/M so the (N, M) distance tile stays small.
    Returns:
      (dist1, dist2, idx1, idx2): per-point min squared distance and argmin
      index in each direction — the exact interface of the reference
      ``chamfer_3DDist`` (dist_chamfer_3D.py:88-95).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    bsz, n, d = a.shape
    m = b.shape[1]

    def direction(x, y):
        # for each chunk of x, min over all of y
        nx = x.shape[1]
        pad = (-nx) % chunk
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        xc = xp.reshape(bsz, -1, chunk, d)                          # (B,K,ch,D)
        y2 = jnp.sum(y * y, axis=-1)                                # (B,M)

        def scan_fn(carry, xcnk):
            d2 = (jnp.sum(xcnk * xcnk, axis=-1)[:, :, None] + y2[:, None, :]
                  - 2.0 * jnp.einsum("bnd,bmd->bnm", xcnk, y,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST))
            # the dot-trick is MXU-shaped but loses ~1e-5 rel precision to
            # cancellation; use it for argmin, then recompute the winning
            # distance exactly (difference form), matching the CUDA kernel's
            # accuracy (chamfer3D.cu computes diffs directly)
            imin = jnp.argmin(d2, axis=-1)
            ynn = jnp.take_along_axis(y, imin[..., None], axis=1)
            dmin = jnp.sum((xcnk - ynn) ** 2, axis=-1)
            return carry, (dmin, imin)

        _, (dmin, imin) = jax.lax.scan(scan_fn, 0,
                                       jnp.moveaxis(xc, 1, 0))
        dmin = jnp.moveaxis(dmin, 0, 1).reshape(bsz, -1)[:, :nx]
        imin = jnp.moveaxis(imin, 0, 1).reshape(bsz, -1)[:, :nx]
        return dmin, imin.astype(jnp.int32)

    dist1, idx1 = direction(a, b)
    dist2, idx2 = direction(b, a)
    return dist1, dist2, idx1, idx2


def chamfer_l2(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Train-time CD of the reference (`train.py:80-84`): per-batch sum of the
    two direction-means of min squared distance.  Returns (B,)."""
    dist1, dist2, _, _ = chamfer_distance(pred, target)
    return jnp.mean(dist1, axis=1) + jnp.mean(dist2, axis=1)


def fscore(dist1: jax.Array, dist2: jax.Array, threshold: float = 0.001):
    """F-score at a squared-distance threshold from Chamfer outputs.

    Port of `ChamferDistancePytorch/fscore.py:3-16`.
    Returns (fscore, precision1, precision2), each (B,).
    """
    precision_1 = jnp.mean((dist1 < threshold).astype(jnp.float32), axis=1)
    precision_2 = jnp.mean((dist2 < threshold).astype(jnp.float32), axis=1)
    denom = precision_1 + precision_2
    f = jnp.where(denom > 0, 2 * precision_1 * precision_2
                  / jnp.maximum(denom, 1e-30), 0.0)
    return f, precision_1, precision_2
