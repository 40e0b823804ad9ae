"""Runtime utilities (port of the reference util.py surface)."""
from pcfm.utils.misc import (MetricEMA, Timer, count_parameters, seed_all,
                             shard_print)
from pcfm.data.ply import (save_point_cloud_ply, save_point_cloud_ply_rgb,
                           save_point_cloud_xyz)

__all__ = [
    "MetricEMA", "Timer", "count_parameters", "seed_all", "shard_print",
    "save_point_cloud_ply", "save_point_cloud_ply_rgb",
    "save_point_cloud_xyz",
]
