"""TPU parallelism: mesh construction + sharding (dp over batch, sp over
points)."""
from pcfm.parallel.mesh import (auto_mesh_sizes, batch_only_sharding,
                                batch_sharding, make_mesh, replicate_state,
                                replicated, shard_batch)
from pcfm.parallel.distributed import cleanup_distributed, init_distributed
from pcfm.parallel.sp_ops import (make_sp_global_max, make_sp_voxelize,
                                  sp_avg_voxelize_local, sp_global_max_local)

__all__ = [
    "auto_mesh_sizes", "batch_only_sharding", "batch_sharding", "make_mesh",
    "replicate_state", "replicated", "shard_batch", "cleanup_distributed",
    "init_distributed", "make_sp_global_max", "make_sp_voxelize",
    "sp_avg_voxelize_local", "sp_global_max_local",
]
