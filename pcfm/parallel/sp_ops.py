"""Explicit sequence-parallel (point-axis) collectives via shard_map.

The jit/GSPMD path already runs the models with the point axis sharded
(tests/test_parallel.py); the partitioner derives the collectives.  These
functions are the EXPLICIT versions — local compute + hand-placed psum /
pmax over the ``points`` mesh axis — for cases where the partitioner's
choice is wasteful (it tends to all-gather the point axis around scatters).

Recipe (SURVEY.md §5 'Long-context'): the model family has no attention;
the ONLY cross-point interactions are
  * the voxel grid:  local scatter-mean partials  -> psum(sum), psum(count)
  * global max-pool: local max                    -> pmax
so sequence parallelism is embarrassingly cheap — one R^3-sized psum per
PVConv and one C-sized pmax per pooling, all riding ICI.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcfm.ops.voxel import flatten_voxel_ids


def sp_avg_voxelize_local(features: jax.Array, vox_coords: jax.Array,
                          resolution: int, axis_name: str = "points"):
    """Shard-local body: scatter partial sums + counts, then psum both.

    Call INSIDE shard_map with features/coords sharded on axis 1.
    Returns the full (replicated-over-points) (B, R, R, R, C) mean grid.
    """
    b, n_local, c = features.shape
    r = resolution
    flat = flatten_voxel_ids(vox_coords, r)
    ones = jnp.ones((b, n_local, 1), jnp.float32)
    fc = jnp.concatenate([features.astype(jnp.float32), ones], axis=-1)

    def one(fb, ib):
        return jax.ops.segment_sum(fb, ib, num_segments=r * r * r)

    partial = jax.vmap(one)(fc, flat)                     # (B, R^3, C+1)
    total = jax.lax.psum(partial, axis_name)
    grid = total[..., :-1] / jnp.maximum(total[..., -1:], 1.0)
    return grid.reshape(b, r, r, r, c)


def sp_global_max_local(h: jax.Array, axis_name: str = "points"):
    """Shard-local global max-pool over points: local max then pmax."""
    return jax.lax.pmax(jnp.max(h, axis=1), axis_name)


def sp_trilinear_devoxelize_local(grid: jax.Array, norm_coords: jax.Array,
                                  resolution: int):
    """Shard-local devoxelize: the grid is replicated over 'points', each
    shard gathers ITS OWN points — no collective in forward; the backward
    scatter of the replicated grid input gets the psum from shard_map's
    transpose automatically."""
    from pcfm.ops.voxel import trilinear_devoxelize
    return trilinear_devoxelize(grid, norm_coords, resolution)


def shmap_avg_voxelize(mesh: Mesh, features: jax.Array,
                       vox_coords: jax.Array, resolution: int) -> jax.Array:
    """shard_map avg_voxelize for use INSIDE a jitted model: local scatter
    + psum(grid) instead of GSPMD's point-axis all-gather."""
    fn = functools.partial(sp_avg_voxelize_local, resolution=resolution)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P("data", "points", None), P("data", "points", None)),
        out_specs=P("data", None, None, None, None))(features, vox_coords)


def shmap_trilinear_devoxelize(mesh: Mesh, grid: jax.Array,
                               norm_coords: jax.Array,
                               resolution: int) -> jax.Array:
    """shard_map trilinear_devoxelize: replicated grid in, point-sharded
    output; backward = local scatter + psum (from the transpose)."""
    fn = functools.partial(sp_trilinear_devoxelize_local,
                           resolution=resolution)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P("data", None, None, None, None),
                  P("data", "points", None)),
        out_specs=P("data", "points", None))(grid, norm_coords)


def make_sp_voxelize(mesh: Mesh, resolution: int,
                     axis_name: str = "points"):
    """Build a shard_map-wrapped avg_voxelize: inputs sharded (B over
    'data', N over 'points'), output grid replicated over 'points'."""
    in_specs = (P("data", axis_name, None), P("data", axis_name, None))
    out_specs = P("data", None, None, None, None)

    @functools.partial(jax.jit)
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs)
    def fn(features, vox_coords):
        return sp_avg_voxelize_local(features, vox_coords, resolution,
                                     axis_name)

    return fn


def make_sp_global_max(mesh: Mesh, axis_name: str = "points"):
    in_specs = (P("data", axis_name, None),)
    out_specs = P("data", None)

    @functools.partial(jax.jit)
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs)
    def fn(h):
        return sp_global_max_local(h, axis_name)

    return fn
