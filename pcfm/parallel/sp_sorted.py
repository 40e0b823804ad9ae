"""Sorted-window voxel kernels under sequence (point-axis) parallelism.

Round-2 gap (VERDICT): the sorted-window Pallas kernels — the hybrid
backbone's 2x step-time win — were gated off whenever the points axis was
sharded, so an sp>1 mesh silently fell back to the XLA scatter path
(pcfm/nn/pvconv.py). This module makes the sorted path legal on a
(data, points) mesh:

  * the ContextNet entry sort becomes SHARD-LOCAL: each points-shard sorts
    its own slice by stage-0 voxel id (``shmap_sort_perm`` /
    ``shmap_permute``). The model is permutation-equivariant, so any
    per-shard order is as good as a global one — and the window kernels
    only need points *within a tile* to be close in id space, which a
    local sort provides exactly as well as a global one.
  * per-voxel counts must be GLOBAL (a voxel's points can span shards):
    scatter-ones locally -> ``psum`` the count grid over 'points' ->
    gather each point's own count back locally (``shmap_stage_cache``).
  * avg-voxelize: local weighted scatter (weights = 1/global-count) ->
    ``psum`` the partial grids. The hand-paired custom-vjp backward
    (gather of grad * inv-count) is exactly right per shard because the
    inv-counts are global.
  * devoxelize: the psum'd grid is replicated over 'points'; each shard
    gathers its own points' 8 corners locally. shard_map's transpose
    inserts the backward psum of the local scatter cotangents
    automatically (replicated-input rule).

Collectives: ONE (B, R^3, C) psum per voxelize and one per count build —
the same volume as the XLA sp path (sp_ops.py) — riding ICI; no point-axis
all-gather anywhere.

Matches reference semantics vox.cu:18-110 / trilinear_devox.cu:21-162
(via the kernels' own parity contract, pcfm/ops/voxel_sorted.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pcfm.ops.pallas.voxel_sorted import pick_window
from pcfm.ops.voxel import flatten_voxel_ids, normalize_coords
from pcfm.ops.voxel_sorted import (_avg_vox_sorted, _devox_sorted,
                                   corner_data, inv_counts_windowed,
                                   permute_points)

_SPEC_BN = P("data", "points")
_SPEC_BNC = P("data", "points", None)


def shmap_sort_perm(mesh: Mesh, coords: jax.Array, r: int,
                    normalize: bool = True, eps: float = 0.0):
    """Shard-local sort permutation by flat voxel id at resolution r.

    The coordinate normalization (per-cloud mean / max-norm) reduces over
    the FULL point axis and runs OUTSIDE shard_map — GSPMD derives the
    cheap psum/pmax. Only the argsort is shard-local.

    Returns (perm, inv): (B, N) int32 arrays of LOCAL indices
    (0..N/sp-1 within each shard), sharded on 'points'. They are only
    meaningful to consumers that apply them inside shard_map with the
    same specs (``shmap_permute``).
    """
    _, vc = normalize_coords(coords, r, normalize=normalize, eps=eps)
    ids = flatten_voxel_ids(vc, r)

    def body(il):
        perm = jnp.argsort(il, axis=1).astype(jnp.int32)
        inv = jnp.argsort(perm, axis=1).astype(jnp.int32)
        return perm, inv

    return jax.shard_map(body, mesh=mesh, in_specs=_SPEC_BN,
                         out_specs=(_SPEC_BN, _SPEC_BN))(ids)


def shmap_permute(mesh: Mesh, x: jax.Array, perm: jax.Array,
                  inv: jax.Array) -> jax.Array:
    """Shard-local ``permute_points`` (gather-fwd / inverse-gather-bwd).
    Unpermute by swapping the (perm, inv) arguments."""

    def body(xl, p, i):
        return permute_points(xl, p, i)

    return jax.shard_map(body, mesh=mesh,
                         in_specs=(_SPEC_BNC, _SPEC_BN, _SPEC_BN),
                         out_specs=_SPEC_BNC)(x, perm, inv)


def shmap_inv_counts(mesh: Mesh, ids: jax.Array, r: int,
                     interpret: bool = False) -> jax.Array:
    """Per-point 1/global-voxel-occupancy: local scatter-ones ->
    psum(count grid) -> local gather. HIGHEST precision keeps the count
    tiles f32 so counts stay exact integers (see inv_counts_windowed)."""

    def body(il):
        _, nl = il.shape
        return inv_counts_windowed(
            il, r, pick_window(r, nl), interpret=interpret,
            grid_reduce=lambda g: jax.lax.psum(g, "points"))

    # check_vma=False: pallas_call inside shard_map can't express the
    # varying-across-mesh annotation yet
    return jax.shard_map(body, mesh=mesh, in_specs=_SPEC_BN,
                         out_specs=_SPEC_BN, check_vma=False)(ids)


def shmap_stage_cache(mesh: Mesh, coords: jax.Array, r: int,
                      normalize: bool = True, eps: float = 0.0,
                      interpret: bool = False) -> dict:
    """Per-resolution voxel metadata under sp — the shard_map counterpart
    of ``build_stage_cache`` (same keys). ``coords`` must already be in
    shard-local sorted order (``shmap_sort_perm``+``shmap_permute``)."""
    norm_coords, vc = normalize_coords(coords, r, normalize=normalize,
                                       eps=eps)
    ids = flatten_voxel_ids(vc, r)
    inv_pt = shmap_inv_counts(mesh, ids, r, interpret)
    return {"norm_coords": norm_coords, "vox_ids": ids, "inv_pt": inv_pt,
            "corners": corner_data(norm_coords, r)}


def shmap_avg_voxelize_sorted(mesh: Mesh, features: jax.Array,
                              ids: jax.Array, inv_pt: jax.Array, r: int,
                              interpret: bool = False) -> jax.Array:
    """Scatter-mean to a flat (B, R^3, C) grid, replicated over 'points':
    local inv-count-weighted window scatter + psum."""

    def body(f, il, ip):
        partial = _avg_vox_sorted(f, il, ip, r, interpret)
        return jax.lax.psum(partial, "points")

    return jax.shard_map(body, mesh=mesh,
                         in_specs=(_SPEC_BNC, _SPEC_BN, _SPEC_BN),
                         out_specs=P("data", None, None),
                         check_vma=False)(features, ids, inv_pt)


def shmap_devox_sorted(mesh: Mesh, grid_flat: jax.Array, corners: tuple,
                       r: int, interpret: bool = False) -> jax.Array:
    """Trilinear gather of each shard's own points from the replicated
    flat grid; backward = local corner scatter + automatic psum."""
    ids8, w8, base = corners

    def body(g, i8, wl, bl):
        return _devox_sorted(g, i8, wl, bl, r, interpret)

    return jax.shard_map(body, mesh=mesh,
                         in_specs=(P("data", None, None),
                                   P("data", None, "points"),
                                   P("data", None, "points"), _SPEC_BN),
                         out_specs=_SPEC_BNC,
                         check_vma=False)(grid_flat, ids8, w8, base)
