"""Sorted-point voxel ops: avg_voxelize / trilinear_devoxelize backed by
the sorted-window Pallas MXU kernels (pcfm/ops/pallas/voxel_sorted.py).

Semantics are identical to `pcfm.ops.voxel` (reference vox.cu /
trilinear_devox.cu); the difference is purely mechanical: points are
assumed roughly sorted by voxel id so each 256-point tile touches a narrow
id window, turning scatter/gather into exact-f32 one-hot MXU matmuls.
Correct for ANY point order (windows derive from per-tile min/max), fast
when sorted — the ContextNet sorts once per step by the stage-0 ids and
all stages reuse that order (coarser-resolution ids of stage-0-sorted
points stay nearly sorted, so windows stay narrow).

Backward passes are hand-paired (gather <-> scatter), never XLA scatter:
  * avg_voxelize bwd wrt features = gather of grad/count at the point's id
  * devoxelize bwd wrt grid = weighted 8-corner scatter of the cotangent
Counts come from searchsorted over the sorted ids (no scatter).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from pcfm.ops.pallas.voxel_sorted import (gather_windows, pick_window,
                                          scatter_windows)
from pcfm.ops.voxel import _corner_ids_weights, flatten_voxel_ids

# Model-path precision policy (same as the shipped R<=16 dense one-hot
# path): bf16 multiplies with f32 accumulation (Mosaic supports only
# DEFAULT and HIGHEST).  Interpolation weights and grid values carry
# ~2^-8 relative rounding — equivalent to sub-milli-voxel coordinate
# jitter, irrelevant to training.  Set HIGHEST for bit-exact f32 parity
# runs (probe-verified exact; ~2.5x slower on the window matmuls).
DOT_PRECISION = jax.lax.Precision.DEFAULT


def _pad_c(x: jax.Array) -> jax.Array:
    """Channels <= 128 pass through (full-dim minor blocks are legal);
    larger channel counts pad to a multiple of 256 — the kernel's channel
    block (_block_c) is 256 above that width, and a 128-multiple like
    C=384 would floor-divide to ONE grid pass and silently drop channels
    256.. (review)."""
    c = x.shape[-1]
    pad = 0 if c <= 128 else (-c) % 256
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))


def counts_sorted(ids_sorted: jax.Array, r3: int) -> jax.Array:
    """Voxel occupancy histogram from SORTED flat ids: (B, N) -> (B, R^3)
    via searchsorted (no scatter)."""
    bins = jnp.arange(r3 + 1, dtype=ids_sorted.dtype)

    def one(s):
        edges = jnp.searchsorted(s, bins, side="left")
        return jnp.diff(edges)

    return jax.vmap(one)(ids_sorted)


def avg_voxelize_sorted(features: jax.Array, ids_sorted: jax.Array,
                        resolution: int, interpret: bool = False,
                        contiguous: bool = True,
                        inv_pt: jax.Array | None = None):
    """Scatter-mean features (B, N, C) into a flat grid (B, R^3, C).

    ``contiguous=True``: equal ids form contiguous runs (points sorted at
    THIS resolution) — per-point inverse counts come from three VPU scans.
    ``contiguous=False``: ids only roughly sorted (e.g. a coarser stage
    under the stage-0 sort order) — counts go through a tiny scatter-ones/
    gather kernel pair instead.
    ``inv_pt``: precomputed per-point inverse counts (stage cache — the
    two PVBlocks of a ContextNet stage share coords, so counts are
    computed once per stage, see ``build_stage_cache``).
    """
    if inv_pt is None:
        inv_pt = compute_inv_counts(ids_sorted, resolution, interpret,
                                    contiguous)
    return _avg_vox_sorted(features, ids_sorted, inv_pt, resolution,
                           interpret)


def compute_inv_counts(ids_sorted: jax.Array, r: int,
                       interpret: bool = False,
                       contiguous: bool = True) -> jax.Array:
    if contiguous:
        return inv_counts_per_point(ids_sorted)
    n = ids_sorted.shape[1]
    return inv_counts_windowed(ids_sorted, r, pick_window(r, n), interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _avg_vox_sorted(features, ids_sorted, inv_pt, resolution,
                    interpret=False):
    grid, _ = _avg_vox_fwd_impl(features, ids_sorted, inv_pt, resolution,
                                interpret)
    return grid


def inv_counts_per_point(ids_sorted: jax.Array) -> jax.Array:
    """1 / (occupancy of each point's own voxel) from SORTED ids, via
    prefix scans only (run-length: first/last index of each equal-id run).
    searchsorted would binary-search-gather (~28 ms at B=8 N=20k on v5e);
    this is three cheap VPU scans."""
    b, n = ids_sorted.shape
    idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    new_run = jnp.concatenate(
        [jnp.ones((b, 1), bool),
         ids_sorted[:, 1:] != ids_sorted[:, :-1]], axis=1)
    first = jax.lax.cummax(jnp.where(new_run, idx, 0), axis=1)
    last_run = jnp.concatenate(
        [new_run[:, 1:], jnp.ones((b, 1), bool)], axis=1)
    last = jnp.flip(jax.lax.cummin(
        jnp.where(jnp.flip(last_run, 1), jnp.flip(idx + 0 * ids_sorted, 1),
                  n - 1), axis=1), 1)
    cnt = (last - first + 1).astype(jnp.float32)
    return 1.0 / cnt


def inv_counts_windowed(ids: jax.Array, r: int, w: int,
                        interpret: bool = False,
                        grid_reduce=None) -> jax.Array:
    """Per-point inverse voxel occupancy for ROUGHLY-sorted ids: scatter
    ones into an 8-lane grid, gather back.  HIGHEST precision keeps f32
    window tiles so counts stay EXACT integers — under DEFAULT the count
    grid would ride bf16 tiles, which round integers above 256 (review
    r2); these kernels are tiny, the precision costs nothing.

    grid_reduce: optional hook applied to the count grid between scatter
    and gather — the sequence-parallel path passes ``lax.psum`` over the
    points axis (pcfm/parallel/sp_sorted.py shmap_inv_counts) so counts
    are GLOBAL while scatter/gather stay shard-local."""
    b, n = ids.shape
    ones8 = jnp.ones((b, n, 8), jnp.float32)
    onesw = jnp.ones((b, 1, n), jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    cnt_grid = scatter_windows(ones8, ids[:, None, :], onesw, ids, r, w,
                               precision=hi, interpret=interpret)
    if grid_reduce is not None:
        cnt_grid = grid_reduce(cnt_grid)
    cnt_pt = gather_windows(cnt_grid, ids[:, None, :], onesw, ids, r, w,
                            precision=hi, interpret=interpret)[..., 0]
    return 1.0 / jnp.maximum(cnt_pt, 1.0)


def _avg_vox_fwd_impl(features, ids_sorted, inv_pt, r, interpret):
    b, n, c = features.shape
    w = pick_window(r, n)
    # mean[v] = sum_n f_n / cnt_v  ==  scatter with weight 1/cnt_{v(n)}
    fp = _pad_c(features)
    grid = scatter_windows(fp, ids_sorted[:, None, :], inv_pt[:, None, :],
                           ids_sorted, r, w, precision=DOT_PRECISION,
                           interpret=interpret)[..., :c]
    return grid, inv_pt


def _avg_vox_fwd(features, ids_sorted, inv_pt, r, interpret):
    grid, _ = _avg_vox_fwd_impl(features, ids_sorted, inv_pt, r, interpret)
    # zero-size array carries the primal dtype through the residuals
    return grid, (ids_sorted, inv_pt, jnp.zeros((0,), features.dtype))


def _avg_vox_bwd(r, interpret, res, g):
    ids_sorted, inv_pt, dtype_probe = res
    dtype = dtype_probe.dtype
    b, n = ids_sorted.shape
    w = pick_window(r, n)
    gs = _pad_c(g.astype(jnp.float32))
    # df_n = g[id_n] / cnt_{v(n)} — fold the inverse count into the
    # gather's weight (same trick as forward)
    df = gather_windows(gs, ids_sorted[:, None, :], inv_pt[:, None, :],
                        ids_sorted, r, w, precision=DOT_PRECISION,
                        interpret=interpret)[..., :g.shape[-1]]
    return df.astype(dtype), None, None


_avg_vox_sorted.defvjp(_avg_vox_fwd, _avg_vox_bwd)


def corner_data(norm_coords: jax.Array, r: int):
    """(B,N,3) float coords -> (ids8 (B,8,N), w8 (B,8,N), base (B,N))."""
    ids8, w8 = _corner_ids_weights(norm_coords, r)          # (B, N, 8)
    return (ids8.transpose(0, 2, 1), w8.transpose(0, 2, 1),
            ids8[..., 0])


def trilinear_devoxelize_sorted(grid_flat: jax.Array,
                                norm_coords: jax.Array,
                                resolution: int, interpret: bool = False,
                                corners: tuple | None = None):
    """Trilinear interpolation of a flat (B, R^3, C) grid at (B, N, 3)
    normalized coords (in [0, R-1], roughly sorted by voxel id).
    Returns (B, N, C) f32.  ``corners``: precomputed
    (ids8, w8, base) from ``corner_data`` (stage cache)."""
    if corners is None:
        corners = corner_data(norm_coords, resolution)
    ids8, w8, base = corners
    return _devox_sorted(grid_flat, ids8, w8, base, resolution, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _devox_sorted(grid_flat, ids8, w8, base, resolution,
                  interpret=False):
    out, _ = _devox_fwd_impl(grid_flat, ids8, w8, base, resolution,
                             interpret)
    return out


def _devox_fwd_impl(grid_flat, ids8, w8, base, r, interpret):
    """8-corner gather as TWO x-offset groups: corners {0..3} live in
    [base, base+R+1], corners {4..7} in [base+R^2, base+R^2+R+1] — two
    narrow windows instead of one R^2-wide one (4x fewer window FLOPs).
    Collapsed hi-corners (frac==0) fall outside the high group's window
    with weight 0: no match, contribution 0, exactly as required."""
    b, r3, c = grid_flat.shape
    n = ids8.shape[-1]
    reach = r + 1
    w = pick_window(r, n, reach)
    gp = _pad_c(grid_flat)
    out = gather_windows(gp, ids8, w8, base, r, w, reach=reach,
                         precision=DOT_PRECISION, groups=(0, r * r),
                         interpret=interpret)[..., :c]
    return out, (ids8, w8, base)


def _devox_fwd(grid_flat, ids8, w8, base, r, interpret):
    out, res = _devox_fwd_impl(grid_flat, ids8, w8, base, r, interpret)
    return out, (res, jnp.zeros((0,) + grid_flat.shape[2:],
                                grid_flat.dtype))


def _devox_bwd(r, interpret, resids, g):
    (ids8, w8, base), dtype_probe = resids
    gshape = dtype_probe.shape
    gdtype = dtype_probe.dtype
    n = ids8.shape[-1]
    reach = r + 1
    w = pick_window(r, n, reach)
    gp = _pad_c(g.astype(jnp.float32))
    dg = scatter_windows(gp, ids8, w8, base, r, w, reach=reach,
                         precision=DOT_PRECISION, groups=(0, r * r),
                         interpret=interpret)[..., :gshape[-1]]
    return dg.astype(gdtype), None, None, None


_devox_sorted.defvjp(_devox_fwd, _devox_bwd)


def build_stage_cache(coords: jax.Array, r: int, sorted_at_res: int,
                      normalize: bool = True, eps: float = 0.0,
                      interpret: bool = False) -> dict:
    """Per-resolution voxel metadata shared by every PVConv at this
    resolution (coords don't change across a ContextNet forward, so the
    2 blocks of a stage — id flattening, occupancy scans, corner
    ids/weights — need computing ONCE, not once per block).

    Returns {'norm_coords', 'vox_ids', 'inv_pt', 'corners'}."""
    from pcfm.ops.voxel import normalize_coords
    norm_coords, vox_coords = normalize_coords(coords, r,
                                               normalize=normalize, eps=eps)
    ids = flatten_voxel_ids(vox_coords, r)
    inv_pt = compute_inv_counts(ids, r, interpret,
                                contiguous=(r == sorted_at_res))
    return {"norm_coords": norm_coords, "vox_ids": ids, "inv_pt": inv_pt,
            "corners": corner_data(norm_coords, r)}


def sort_perm_by_voxel(coords: jax.Array, resolution: int,
                       normalize: bool = True,
                       eps: float = 0.0) -> Tuple[jax.Array, jax.Array]:
    """(B, N, 3) raw coords -> (perm, inv_perm) sorting points by their
    flat voxel id at `resolution` (the ContextNet entry sort)."""
    from pcfm.ops.voxel import normalize_coords
    _, vc = normalize_coords(coords, resolution, normalize=normalize,
                             eps=eps)
    ids = flatten_voxel_ids(vc, resolution)
    perm = jnp.argsort(ids, axis=1).astype(jnp.int32)
    inv = jnp.argsort(perm, axis=1).astype(jnp.int32)
    return perm, inv


@jax.custom_vjp
def permute_points(x: jax.Array, perm: jax.Array, inv: jax.Array):
    """Gather rows of (B, N, C) by perm; backward uses the INVERSE
    permutation gather (never an XLA scatter)."""
    return jnp.take_along_axis(x, perm[..., None], axis=1)


def _permute_fwd(x, perm, inv):
    return permute_points(x, perm, inv), (perm, inv)


def _permute_bwd(res, g):
    perm, inv = res
    return jnp.take_along_axis(g, inv[..., None], axis=1), None, None


permute_points.defvjp(_permute_fwd, _permute_bwd)


def unpermute_points(x: jax.Array, perm: jax.Array, inv: jax.Array):
    """Inverse of permute_points (same custom-vjp gather pairing)."""
    return permute_points(x, inv, perm)
