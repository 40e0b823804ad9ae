"""Pallas TPU kernels for the hot point-cloud ops.

``chamfer_distance_pallas_v3`` is EXPERIMENTAL: it compiles and is exact on
distances (the winning distance is recomputed outside the kernel), but on
v5e it only matches the XLA chunked-MXU chamfer (`pcfm.ops.chamfer`) in
speed and its in-kernel argmin can differ from the oracle on near-ties
(~0.01% of rows, default-precision dot scoring).  The XLA path stays the
default; two earlier variants (VPU broadcast-diff, in-kernel dynamic-slice
MXU) were measured slower / failed to compile and were removed — history
and numbers in ROADMAP.md.

``voxel_pallas`` holds the production scatter/gather kernels for the
R>16 voxel stages (the hybrid backbone's hot path).
"""
from pcfm.ops.pallas.chamfer_v3 import chamfer_distance_pallas_v3

__all__ = ["chamfer_distance_pallas_v3"]
