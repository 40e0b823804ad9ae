"""Pallas TPU kernels for the hot point-cloud ops."""
from pcfm.ops.pallas.chamfer_pallas import chamfer_distance_pallas
from pcfm.ops.pallas.chamfer_v2 import chamfer_distance_pallas_v2
from pcfm.ops.pallas.chamfer_v3 import chamfer_distance_pallas_v3

__all__ = ["chamfer_distance_pallas", "chamfer_distance_pallas_v2",
           "chamfer_distance_pallas_v3"]
