"""Pallas TPU kernels for the hot point-cloud ops."""
from pcfm.ops.pallas.chamfer_pallas import chamfer_distance_pallas

__all__ = ["chamfer_distance_pallas"]
