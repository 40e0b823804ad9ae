"""Voxelization ops: scatter-mean point->grid and trilinear grid->point.

TPU-native formulation of the reference CUDA kernels
(`third_party/pvcnn/modules/functional/src/voxelization/vox.cu` and
`src/interpolate/trilinear_devox.cu` in the reference repo):

* ``avg_voxelize`` — scatter-mean of per-point features into an R^3 grid.
  The CUDA kernel uses atomicAdd (nondeterministic float order); here we use
  a per-batch ``segment_sum`` over flattened voxel ids, which is
  deterministic.  Count and feature sums are fused into a single segment-sum
  by appending a ones channel.
* ``trilinear_devoxelize`` — gather-interpolate the 8 surrounding voxels of
  each (float) point coordinate.  The backward scatter-add of the CUDA
  kernel comes for free from JAX autodiff of the gather.
* ``normalize_coords`` — the exact coordinate normalization of
  ``modules/voxelization.py:16-25`` (mean-center, max-L2-norm*2+eps, +0.5,
  scale by R, clamp to [0, R-1]); coordinates are ``stop_gradient``-ed as in
  the reference (``coords.detach()``).

Layout note: this framework is channel-last throughout — features are
``(B, N, C)`` and grids are ``(B, R, R, R, C)`` (NDHWC), which is the
layout XLA:TPU prefers for convolutions and keeps the C axis on VPU lanes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_coords(coords: jax.Array, resolution: int, normalize: bool = True,
                     eps: float = 0.0) -> tuple[jax.Array, jax.Array]:
    """Reference-parity voxel coordinate normalization.

    Args:
      coords: (B, N, 3) float xyz.
      resolution: voxel grid resolution R.
      normalize: if True, center by per-cloud mean and scale by twice the max
        point L2-norm (+eps); else assume coords already in [-1, 1].
    Returns:
      (norm_coords, vox_coords): float coords in [0, R-1] and rounded int32
      voxel coords.  Gradients do not flow through either (the reference
      detaches coords before voxelization).
    """
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    r = float(resolution)
    centered = coords - jnp.mean(coords, axis=1, keepdims=True)
    if normalize:
        # max over points of the per-point L2 norm, per batch element
        norm = jnp.linalg.norm(centered, axis=-1, keepdims=True)     # (B,N,1)
        denom = jnp.max(norm, axis=1, keepdims=True) * 2.0 + eps     # (B,1,1)
        norm_coords = centered / denom + 0.5
    else:
        norm_coords = (centered + 1.0) / 2.0
    norm_coords = jnp.clip(norm_coords * r, 0.0, r - 1.0)
    vox_coords = jnp.round(norm_coords).astype(jnp.int32)
    return norm_coords, vox_coords


def flatten_voxel_ids(vox_coords: jax.Array, resolution: int) -> jax.Array:
    """(B, N, 3) int voxel coords -> (B, N) flat ids ``x*R^2 + y*R + z``."""
    r = resolution
    return (vox_coords[..., 0] * r + vox_coords[..., 1]) * r + vox_coords[..., 2]


def avg_voxelize(features: jax.Array, vox_coords: jax.Array,
                 resolution: int) -> jax.Array:
    """Scatter-mean features into a voxel grid.

    Args:
      features: (B, N, C) float point features.
      vox_coords: (B, N, 3) int32 voxel coords in [0, R).
      resolution: R.
    Returns:
      (B, R, R, R, C) float grid; empty voxels are zero.  Matches the
      reference ``avg_voxelize`` (vox.cu:18-110) but with deterministic
      accumulation order.
    """
    b, n, c = features.shape
    r = resolution
    features = features.astype(jnp.float32)
    flat = flatten_voxel_ids(vox_coords, r)                         # (B, N)
    ones = jnp.ones((b, n, 1), features.dtype)
    fc = jnp.concatenate([features, ones], axis=-1)                 # (B,N,C+1)

    def one_batch(f, ids):
        return jax.ops.segment_sum(f, ids, num_segments=r * r * r)

    sums = jax.vmap(one_batch)(fc, flat)                            # (B,R^3,C+1)
    cnt = sums[..., -1:]
    grid = sums[..., :-1] / jnp.maximum(cnt, 1.0)
    return grid.reshape(b, r, r, r, c)


def trilinear_devoxelize(grid: jax.Array, norm_coords: jax.Array,
                         resolution: int) -> jax.Array:
    """Trilinear interpolation of a voxel grid at float point coordinates.

    Args:
      grid: (B, R, R, R, C) float voxel features.
      norm_coords: (B, N, 3) float coords in [0, R-1] (from
        ``normalize_coords``).
    Returns:
      (B, N, C) per-point features.  The reference kernel's boundary trick
      (hi index collapses to lo when the fractional part is 0,
      trilinear_devox.cu:64-75) is reproduced via ``lo + (frac > 0)``:
      whenever frac > 0 we have coord < R-1, so lo+1 <= R-1 stays in range.
    """
    b, r, _, _, c = grid.shape
    assert r == resolution
    coords = jax.lax.stop_gradient(norm_coords.astype(jnp.float32))
    lo_f = jnp.floor(coords)
    frac = coords - lo_f                                            # (B,N,3)
    lo = lo_f.astype(jnp.int32)
    hi = lo + (frac > 0).astype(jnp.int32)

    w1 = frac
    w0 = 1.0 - frac
    flat = grid.reshape(b, r * r * r, c)

    def corner(sel_x, sel_y, sel_z):
        x = jnp.where(sel_x, hi[..., 0], lo[..., 0])
        y = jnp.where(sel_y, hi[..., 1], lo[..., 1])
        z = jnp.where(sel_z, hi[..., 2], lo[..., 2])
        idx = (x * r + y) * r + z                                   # (B,N)
        wx = jnp.where(sel_x, w1[..., 0], w0[..., 0])
        wy = jnp.where(sel_y, w1[..., 1], w0[..., 1])
        wz = jnp.where(sel_z, w1[..., 2], w0[..., 2])
        w = (wx * wy * wz)[..., None]                               # (B,N,1)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)       # (B,N,C)
        return w * g

    out = None
    for sx in (False, True):
        for sy in (False, True):
            for sz in (False, True):
                term = corner(sx, sy, sz)
                out = term if out is None else out + term
    return out


def _corner_ids_weights(norm_coords: jax.Array, r: int):
    """(B,N,3) float coords -> (ids8 (B,N,8) int32, w8 (B,N,8) f32) with the
    reference's frac==0 boundary collapse."""
    coords = jax.lax.stop_gradient(norm_coords.astype(jnp.float32))
    lo_f = jnp.floor(coords)
    frac = coords - lo_f
    lo = lo_f.astype(jnp.int32)
    hi = lo + (frac > 0).astype(jnp.int32)
    ids = []
    ws = []
    for sx in (0, 1):
        for sy in (0, 1):
            for sz in (0, 1):
                x = hi[..., 0] if sx else lo[..., 0]
                y = hi[..., 1] if sy else lo[..., 1]
                z = hi[..., 2] if sz else lo[..., 2]
                ids.append((x * r + y) * r + z)
                wx = frac[..., 0] if sx else 1.0 - frac[..., 0]
                wy = frac[..., 1] if sy else 1.0 - frac[..., 1]
                wz = frac[..., 2] if sz else 1.0 - frac[..., 2]
                ws.append(wx * wy * wz)
    return jnp.stack(ids, axis=-1), jnp.stack(ws, axis=-1)


# Threshold under which the dense one-hot-matmul formulation is used by the
# model path: the (B, N, R^3) weight matrix fits comfortably and both
# scatter and gather become MXU matmuls (measured ~5-10x faster than the
# XLA scatter/gather at R<=16 on v5e).
DENSE_R3_MAX = 4096


def avg_voxelize_dense(features: jax.Array, vox_coords: jax.Array,
                       resolution: int,
                       precision=jax.lax.Precision.HIGHEST,
                       oh_dtype=jnp.float32) -> jax.Array:
    """MXU formulation of avg_voxelize for small grids (R^3 <= ~4096).

    The one-hot scatter matrix is built with a broadcast compare (VPU) and
    the accumulation is a single batched matmul.  Counts accumulate in f32
    (each one-hot term is exact), so the mean is exact; the feature matmul
    runs at HIGHEST precision (fp32-accurate on the MXU) by default.
    """
    b, n, c = features.shape
    r = resolution
    r3 = r * r * r
    flat = flatten_voxel_ids(vox_coords, r)                         # (B,N)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, r3), 2)
    # one-hot entries (0/1) are exact in bf16, so oh_dtype=bfloat16 halves
    # the materialization traffic without changing counts (f32 accumulate)
    oh = (flat[..., None] == iota).astype(oh_dtype)                 # (B,N,R3)
    sums = jnp.einsum("bnv,bnc->bvc", oh, features.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=precision)
    cnt = jnp.einsum("bnv->bv", oh.astype(jnp.float32))             # (B,R3)
    grid = sums / jnp.maximum(cnt[..., None], 1.0)
    return grid.reshape(b, r, r, r, c)


def trilinear_devoxelize_dense(grid: jax.Array, norm_coords: jax.Array,
                               resolution: int,
                               precision=jax.lax.Precision.HIGHEST,
                               w_dtype=jnp.float32) -> jax.Array:
    """MXU formulation of trilinear_devoxelize for small grids: the sparse
    (8-per-row) interpolation matrix is densified via 8 broadcast compares
    and applied as one batched matmul; backward wrt the grid is the
    transposed matmul (autodiff), with no scatter anywhere."""
    b, r, _, _, c = grid.shape
    assert r == resolution
    r3 = r * r * r
    ids8, w8 = _corner_ids_weights(norm_coords, r)                  # (B,N,8)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, r3), 3)
    w = jnp.sum((ids8[..., None] == iota) * w8[..., None].astype(w_dtype),
                axis=2).astype(w_dtype)                             # (B,N,R3)
    flat = grid.reshape(b, r3, c)
    return jnp.einsum("bnv,bvc->bnc", w, flat,
                      preferred_element_type=jnp.float32,
                      precision=precision)


def trilinear_devoxelize_windowed(grid: jax.Array, norm_coords: jax.Array,
                                  resolution: int) -> jax.Array:
    """Windowed-gather formulation of ``trilinear_devoxelize``.

    The 8 interpolation corners form one contiguous 2x2x2 window at
    ``floor(coords)``, so instead of 8 scattered row gathers this issues ONE
    ``lax.gather`` of (2, 2, 2, C) slices from a zero-padded (R+1)^3 grid —
    a much friendlier access pattern for the TPU memory system.  The pad
    cell carries weight 0 exactly when it can be addressed (frac == 0
    boundary), so results match the corner form bit-for-bit up to summation
    order.  Backward (scatter-add of windows) comes from autodiff.
    """
    b, r, _, _, c = grid.shape
    assert r == resolution
    coords = jax.lax.stop_gradient(norm_coords.astype(jnp.float32))
    lo_f = jnp.floor(coords)
    frac = coords - lo_f                                            # (B,N,3)
    lo = lo_f.astype(jnp.int32)

    padded = jnp.pad(grid, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))

    def one(g, starts):
        return jax.lax.gather(g, starts, dnums, slice_sizes=(2, 2, 2, c),
                              mode=jax.lax.GatherScatterMode.CLIP)

    win = jax.vmap(one)(padded, lo)                          # (B,N,2,2,2,C)
    w1 = frac
    w0 = 1.0 - frac
    wx = jnp.stack([w0[..., 0], w1[..., 0]], axis=-1)        # (B,N,2)
    wy = jnp.stack([w0[..., 1], w1[..., 1]], axis=-1)
    wz = jnp.stack([w0[..., 2], w1[..., 2]], axis=-1)
    return jnp.einsum("bnxyzc,bnx,bny,bnz->bnc", win, wx, wy, wz,
                      preferred_element_type=jnp.float32)
