"""Process-level sequence-parallel mesh context.

GSPMD partitions everything in the model well EXCEPT the voxel
scatter/gather, where it all-gathers the point axis around every stage-0
voxelize (a 20k-point all-gather per PVConv on a real pod, vs the R^3-sized
psum the explicit shard_map formulation needs — `pcfm/parallel/sp_ops.py`).

Because PVConv sits many modules deep (HybridMLP -> ContextNet -> PVStage
-> PVBlock -> PVConv) and is also traced by the eval/sampling closures, the
mesh is exposed as a process-level context instead of threading an
attribute through six module signatures: the train loop (or
``dryrun_multichip``) calls ``set_sp_mesh(mesh)`` once after building the
mesh, and ``Voxelization``/``PVConv`` consult ``sp_mesh_for(b, n)`` at
trace time.  With no mesh set (single device, or points axis of size 1)
every model runs the plain GSPMD path unchanged.
"""
from __future__ import annotations

from typing import Optional

from jax.sharding import Mesh

_SP_MESH: Optional[Mesh] = None


def set_sp_mesh(mesh: Optional[Mesh]) -> None:
    """Install (or clear, with None) the sequence-parallel mesh used by the
    voxel ops.  Call BEFORE tracing the train/eval step."""
    global _SP_MESH
    if mesh is not None and "points" not in mesh.axis_names:
        mesh = None
    _SP_MESH = mesh


def get_sp_mesh() -> Optional[Mesh]:
    return _SP_MESH


def sp_mesh_for(batch: int, n_points: int) -> Optional[Mesh]:
    """The mesh to shard_map over for a (B, N, ...) operand — or None when
    sequence parallelism is off or the static shape doesn't tile (init-time
    dummy shapes fall back to the GSPMD path silently)."""
    mesh = _SP_MESH
    if mesh is None:
        return None
    sp = mesh.shape.get("points", 1)
    dp = mesh.shape.get("data", 1)
    if sp <= 1 or n_points % sp or batch % dp:
        return None
    return mesh
