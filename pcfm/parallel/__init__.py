"""TPU parallelism: mesh construction + sharding (dp over batch, sp over
points)."""
from pcfm.parallel.mesh import (auto_mesh_sizes, batch_only_sharding,
                                batch_sharding, make_mesh, replicate_state,
                                replicated, shard_batch)
from pcfm.parallel.distributed import cleanup_distributed, init_distributed

__all__ = [
    "auto_mesh_sizes", "batch_only_sharding", "batch_sharding", "make_mesh",
    "replicate_state", "replicated", "shard_batch", "cleanup_distributed",
    "init_distributed",
]
