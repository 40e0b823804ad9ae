"""Flax building blocks mirroring the reference L2 layer (SURVEY.md §1)."""
from pcfm.nn.common import (BatchNorm1d, Identity, choose_gn_groups,
                            kaiming_normal, make_norm, normal02)
from pcfm.nn.film import FiLM1d, FiLMBlock
from pcfm.nn.shared_mlp import SharedMLP
from pcfm.nn.se import SE3d
from pcfm.nn.pvconv import PVConv, Voxelization
from pcfm.nn.pointnet import (BallQuery, PointNetAModule, PointNetFPModule,
                              PointNetSAModule)

__all__ = [
    "BatchNorm1d", "Identity", "choose_gn_groups", "kaiming_normal",
    "make_norm", "normal02", "FiLM1d", "FiLMBlock", "SharedMLP", "SE3d",
    "PVConv", "Voxelization", "BallQuery", "PointNetAModule",
    "PointNetFPModule", "PointNetSAModule",
]
