"""PointNet(++) set-abstraction / feature-propagation modules.

Ports of `third_party/pvcnn/modules/ball_query.py` (BallQuery grouper) and
`third_party/pvcnn/modules/pointnet.py` (PointNetAModule / SAModule /
FPModule), channel-last.
"""
from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from pcfm.nn.shared_mlp import SharedMLP
from pcfm.ops.ball_query import ball_query, grouping
from pcfm.ops.interpolate import nearest_neighbor_interpolate
from pcfm.ops.sampling import furthest_point_sample


class BallQuery(nn.Module):
    """Grouper: neighbors within radius, centered coords (+features).

    Returns (B, M, U, C') with C' = 3 (+C) when include_coordinates.
    """
    radius: float
    num_neighbors: int
    include_coordinates: bool = True

    def __call__(self, points_coords, centers_coords, points_features=None):
        idx = ball_query(centers_coords, points_coords, self.radius,
                         self.num_neighbors)                        # (B,M,U)
        neighbor_coords = grouping(points_coords, idx)              # (B,M,U,3)
        neighbor_coords = neighbor_coords - centers_coords[:, :, None, :]
        if points_features is None:
            assert self.include_coordinates, "No features for grouping"
            return neighbor_coords
        feats = grouping(points_features, idx)                      # (B,M,U,C)
        if self.include_coordinates:
            feats = jnp.concatenate([neighbor_coords, feats], axis=-1)
        return feats


def _nested(out_channels) -> Sequence[Sequence[int]]:
    if not isinstance(out_channels, (list, tuple)):
        return [[out_channels]]
    if not isinstance(out_channels[0], (list, tuple)):
        return [list(out_channels)]
    return [list(oc) for oc in out_channels]


class PointNetAModule(nn.Module):
    """Global aggregation module (pointnet.py:11-46)."""
    out_channels: Union[int, Sequence]
    include_coordinates: bool = True

    @nn.compact
    def __call__(self, features, coords, train: bool = True):
        ocs = _nested(self.out_channels)
        if self.include_coordinates:
            features = jnp.concatenate([features, coords], axis=-1)
        outs = []
        for i, oc in enumerate(ocs):
            h = SharedMLP(oc, name=f"mlp_{i}")(features, train=train)
            outs.append(jnp.max(h, axis=1, keepdims=True))          # (B,1,C)
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        new_coords = jnp.zeros((coords.shape[0], 1, 3), coords.dtype)
        return out, new_coords


class PointNetSAModule(nn.Module):
    """Set-abstraction: FPS centers + multi-radius ball-query groupers
    (pointnet.py:49-95)."""
    num_centers: int
    radius: Union[float, Sequence[float]]
    num_neighbors: Union[int, Sequence[int]]
    out_channels: Union[int, Sequence]
    include_coordinates: bool = True

    @nn.compact
    def __call__(self, features, coords, train: bool = True):
        radii = self.radius if isinstance(self.radius, (list, tuple)) \
            else [self.radius]
        nns = self.num_neighbors if isinstance(self.num_neighbors,
                                               (list, tuple)) \
            else [self.num_neighbors] * len(radii)
        ocs = _nested(self.out_channels)
        if len(ocs) == 1 and len(radii) > 1:
            ocs = ocs * len(radii)

        centers = furthest_point_sample(coords, self.num_centers)   # (B,M,3)
        outs = []
        for i, (r, u, oc) in enumerate(zip(radii, nns, ocs)):
            grouper = BallQuery(radius=r, num_neighbors=u,
                                include_coordinates=self.include_coordinates)
            g = grouper(coords, centers, features)                  # (B,M,U,C)
            h = SharedMLP(oc, name=f"mlp_{i}")(g, train=train)
            outs.append(jnp.max(h, axis=2))                         # (B,M,C)
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        return out, centers


class PointNetFPModule(nn.Module):
    """Feature propagation via 3-NN interpolation (pointnet.py:98-111)."""
    out_channels: Union[int, Sequence[int]]

    @nn.compact
    def __call__(self, points_coords, centers_coords, centers_features,
                 points_features=None, train: bool = True):
        interp = nearest_neighbor_interpolate(points_coords, centers_coords,
                                              centers_features)
        if points_features is not None:
            interp = jnp.concatenate([interp, points_features], axis=-1)
        return (SharedMLP(self.out_channels, name="mlp")(interp, train=train),
                points_coords)
