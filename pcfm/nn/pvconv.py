"""PVConv — point-voxel convolution, the hot block of the hybrid backbone.

Port of `third_party/pvcnn/modules/pvconv.py` + `modules/voxelization.py`:
  voxel branch: normalize+round coords -> avg_voxelize -> [Conv3d ->
    BatchNorm(eps 1e-4) -> LeakyReLU(0.1)] x2 -> optional SE3d ->
    trilinear devoxelize back to points
  point branch: SharedMLP(1x1)
  output: voxel features + point features.

TPU design: the grid is NDHWC so Conv3d maps straight onto the MXU; the
scatter/gather ops are the pure-JAX segment-sum/gather kernels in
``pcfm.ops.voxel``.  Coordinates are stop-gradiented exactly like the
reference (``coords.detach()``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcfm.nn.se import SE3d
from pcfm.nn.shared_mlp import SharedMLP
from pcfm.ops.voxel import (DENSE_R3_MAX, avg_voxelize, avg_voxelize_dense,
                            normalize_coords, trilinear_devoxelize,
                            trilinear_devoxelize_dense)
from pcfm.parallel.sp_context import sp_mesh_for

# grids at or above this size route through the sorted-window Pallas
# kernels when the backend is "sorted" (below it the dense MXU one-hot is
# already fast); the sorted kernels run in interpret mode off-TPU so the
# same code path is testable on CPU
SORTED_R3_MIN = 4096
# voxel-grid BatchNorm implementation: "flat" collapses the NDHWC grid to
# (B*D*H*W, C) before the stats reduce (avoids XLA's channel-major
# transpose copy — ROADMAP #18), "flax" is the stock nn.BatchNorm; both
# produce identical param/stat trees and numerics equal up to reduction
# order (tests/test_nn.py equality tests).  "flat_bf16" additionally
# normalizes in the island dtype (output bf16 when the island is bf16) —
# probe_bn_r4 measured 98.1 vs 99.1 ms on the 20k hybrid step, so it is
# the default; fp32-island configs (module dtype fp32, e.g. the transplant
# parity tests) still normalize in fp32 because bn_dtype follows self.dtype.
BN_IMPL = "flat_bf16"
# ... and only for point counts where the window matmuls amortize the
# sort/metadata cost (below this the XLA segment-sum/gather already wins)
SORTED_N_MIN = 4096


def _use_dense(resolution: int) -> bool:
    return resolution ** 3 <= DENSE_R3_MAX


def _use_sorted(backend: str, resolution: int, b: int, n: int) -> bool:
    """Sorted kernels are legal under a points-sharded mesh too (shard-
    local sort + psum grids, pcfm/parallel/sp_sorted.py); the N threshold
    then applies to the SHARD-local point count."""
    if backend != "sorted" or resolution ** 3 < SORTED_R3_MIN:
        return False
    mesh = sp_mesh_for(b, n)
    sp = mesh.shape.get("points", 1) if mesh is not None else 1
    return n // sp >= SORTED_N_MIN


def _interp() -> bool:
    return jax.default_backend() != "tpu"


class Voxelization(nn.Module):
    """Parameterless voxelizer (reference modules/voxelization.py:9-28).

    Execution strategy is picked by grid size: small grids use the dense
    MXU one-hot-matmul scatter (numerically equal, ~10x faster on TPU),
    large grids the deterministic segment-sum.
    """
    resolution: int
    normalize: bool = True
    eps: float = 0.0
    voxel_backend: str = "xla"       # "xla" | "sorted"
    sorted_at_res: int = -1          # resolution the points were sorted at

    def __call__(self, features, coords, cache: dict | None = None):
        if _use_sorted(self.voxel_backend, self.resolution,
                       features.shape[0], features.shape[1]):
            r = self.resolution
            b, n, c = features.shape
            sp_mesh = sp_mesh_for(b, n)
            if sp_mesh is not None:
                # points sharded: shard-local window scatter + psum grid
                # (coords must be in shard-local sorted order — the
                # ContextNet entry sort handles that)
                from pcfm.parallel.sp_sorted import (
                    shmap_avg_voxelize_sorted, shmap_stage_cache)
                if cache is None:
                    cache = shmap_stage_cache(sp_mesh, coords, r,
                                              normalize=self.normalize,
                                              eps=self.eps,
                                              interpret=_interp())
                grid = shmap_avg_voxelize_sorted(
                    sp_mesh, features, cache["vox_ids"], cache["inv_pt"],
                    r, _interp())
                return grid.reshape(b, r, r, r, c), cache["norm_coords"]
            from pcfm.ops.voxel_sorted import (avg_voxelize_sorted,
                                               build_stage_cache)
            if cache is None:
                cache = build_stage_cache(coords, r, self.sorted_at_res,
                                          normalize=self.normalize,
                                          eps=self.eps, interpret=_interp())
            grid = avg_voxelize_sorted(
                features, cache["vox_ids"], r, _interp(),
                inv_pt=cache["inv_pt"])
            return grid.reshape(b, r, r, r, c), cache["norm_coords"]
        # normalize_coords reduces over the FULL point axis (per-cloud mean
        # + max norm) so it stays OUTSIDE any shard_map: GSPMD derives the
        # cheap psum/pmax for the sharded reductions
        norm_coords, vox_coords = normalize_coords(
            coords, self.resolution, normalize=self.normalize, eps=self.eps)
        mesh = sp_mesh_for(features.shape[0], features.shape[1])
        if mesh is not None:
            # sequence parallel: local scatter + psum(grid) — avoids the
            # GSPMD point-axis all-gather around the scatter
            from pcfm.parallel.sp_ops import shmap_avg_voxelize
            grid = shmap_avg_voxelize(mesh, features, vox_coords,
                                      self.resolution)
        elif _use_dense(self.resolution):
            # model path: DEFAULT precision (bf16 multiplies, f32 accum) —
            # counts stay exact; ~2x faster than HIGHEST on the MXU
            grid = avg_voxelize_dense(features, vox_coords, self.resolution,
                                      precision=jax.lax.Precision.DEFAULT,
                                      oh_dtype=jnp.bfloat16)
        else:
            grid = avg_voxelize(features, vox_coords, self.resolution)
        return grid, norm_coords


class PVConv(nn.Module):
    out_channels: int
    kernel_size: int = 3
    resolution: int = 32
    with_se: bool = False
    normalize: bool = True
    eps: float = 0.0
    dtype: jnp.dtype = jnp.float32
    voxel_backend: str = "xla"
    sorted_at_res: int = -1
    # grid-BN implementation (Config.grid_bn); "" falls back to the
    # module-level BN_IMPL default so probes/tests can still flip the
    # global — the run's choice is recorded in the checkpointed config
    bn_impl: str = ""

    @nn.compact
    def __call__(self, features, coords, train: bool = True,
                 cache: dict | None = None):
        """features (B,N,C), coords (B,N,3) -> (fused (B,N,out), coords).
        ``cache``: per-resolution voxel metadata (build_stage_cache) shared
        across the PVConvs of a ContextNet stage."""
        r = self.resolution
        vox = Voxelization(r, normalize=self.normalize, eps=self.eps,
                           voxel_backend=self.voxel_backend,
                           sorted_at_res=self.sorted_at_res)
        grid, norm_coords = vox(features, coords, cache=cache)      # NDHWC

        k = self.kernel_size
        for i in range(2):
            # no conv bias: dead through the following BatchNorm (the BN
            # batch-mean subtraction absorbs any per-channel constant; see
            # shared_mlp.py) — saves a grid-sized cotangent reduction in bwd
            grid = nn.Conv(self.out_channels, (k, k, k), padding="SAME",
                           dtype=self.dtype, use_bias=False,
                           kernel_init=nn.initializers.lecun_normal(),
                           name=f"conv3d_{i}")(grid)
            bn_impl = self.bn_impl or BN_IMPL
            if bn_impl.startswith("flat"):
                from pcfm.nn.common import FlatBatchNorm
                bn_dtype = (self.dtype if bn_impl == "flat_bf16"
                            else jnp.float32)
                grid = FlatBatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-4,
                                     dtype=bn_dtype,
                                     name=f"bn3d_{i}")(grid)
            else:
                grid = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-4, axis=-1,
                                    dtype=jnp.float32,
                                    name=f"bn3d_{i}")(grid)
            grid = nn.leaky_relu(grid, negative_slope=0.1)
        if self.with_se:
            grid = SE3d(self.out_channels, dtype=self.dtype, name="se")(grid)

        if _use_sorted(self.voxel_backend, r, norm_coords.shape[0],
                       norm_coords.shape[1]):
            b = grid.shape[0]
            sp_mesh = sp_mesh_for(norm_coords.shape[0],
                                  norm_coords.shape[1])
            if sp_mesh is not None:
                from pcfm.ops.voxel_sorted import corner_data
                from pcfm.parallel.sp_sorted import shmap_devox_sorted
                corners = (cache["corners"] if cache is not None
                           else corner_data(norm_coords, r))
                voxel_features = shmap_devox_sorted(
                    sp_mesh, grid.reshape(b, r * r * r, -1), corners, r,
                    _interp())
            else:
                from pcfm.ops.voxel_sorted import \
                    trilinear_devoxelize_sorted
                voxel_features = trilinear_devoxelize_sorted(
                    grid.reshape(b, r * r * r, -1), norm_coords, r,
                    _interp(),
                    corners=None if cache is None else cache["corners"])
        elif (mesh := sp_mesh_for(norm_coords.shape[0],
                                  norm_coords.shape[1])) is not None:
            from pcfm.parallel.sp_ops import shmap_trilinear_devoxelize
            voxel_features = shmap_trilinear_devoxelize(mesh, grid,
                                                        norm_coords, r)
        elif _use_dense(r):
            voxel_features = trilinear_devoxelize_dense(
                grid, norm_coords, r, precision=jax.lax.Precision.DEFAULT,
                w_dtype=jnp.bfloat16)
        else:
            voxel_features = trilinear_devoxelize(grid, norm_coords, r)
        point_features = SharedMLP(self.out_channels, dtype=self.dtype,
                                   name="point_features")(features,
                                                          train=train)
        return voxel_features + point_features, coords
