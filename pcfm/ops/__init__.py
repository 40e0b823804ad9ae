"""Point-cloud primitives: TPU-native equivalents of every native kernel in
the reference (SURVEY.md §2.5 rows N1-N11)."""
from pcfm.ops.voxel import (avg_voxelize, trilinear_devoxelize,
                            normalize_coords, flatten_voxel_ids)
from pcfm.ops.chamfer import (chamfer_distance, chamfer_l2, pairwise_sqdist,
                              fscore)
from pcfm.ops.emd import (earth_mover_distance,
                          earth_mover_distance_streamed, approxmatch,
                          matchcost)
from pcfm.ops.sampling import (furthest_point_sample,
                               furthest_point_sample_indices, gather,
                               logits_mask)
from pcfm.ops.ball_query import ball_query, grouping
from pcfm.ops.interpolate import (nearest_neighbor_interpolate, three_nn,
                                  three_nn_weights)
from pcfm.ops.losses import kl_loss, huber_loss

__all__ = [
    "avg_voxelize", "trilinear_devoxelize", "normalize_coords",
    "flatten_voxel_ids", "chamfer_distance", "chamfer_l2", "pairwise_sqdist",
    "fscore", "earth_mover_distance", "earth_mover_distance_streamed",
    "approxmatch", "matchcost",
    "furthest_point_sample", "furthest_point_sample_indices", "gather",
    "logits_mask",
    "ball_query", "grouping", "nearest_neighbor_interpolate", "three_nn",
    "three_nn_weights", "kl_loss", "huber_loss",
]
