"""TPU parallelism: mesh construction + sharding (dp over batch, sp over
points)."""
from pcfm.parallel.mesh import (batch_only_sharding, batch_sharding,
                                make_mesh, replicate_state, replicated,
                                shard_batch)

__all__ = [
    "batch_only_sharding", "batch_sharding", "make_mesh", "replicate_state",
    "replicated", "shard_batch",
]
