"""Device mesh + sharding helpers.

The reference's only parallelism is NCCL DDP (SURVEY.md §2.6).  The
TPU-native replacement is GSPMD over a 2-D mesh:
  * ``data``   — batch axis (the DDP analogue; gradient psum over ICI is
    inserted by XLA automatically)
  * ``points`` — the point axis WITHIN an example (sequence parallelism for
    this model family: per-point MLPs shard trivially; the voxel scatter
    becomes partial grids + psum; global max-pool becomes pmax — all
    derived by the SPMD partitioner from these annotations)

Params and train state are replicated; batches are sharded
(B -> data, N -> points).  One ``jax.jit`` over the mesh covers 1..N chips
with zero code changes — there is no separate "distributed" code path.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def auto_mesh_sizes(batch_size: int, n_points: int, dp: int = -1,
                    sp: int = 1, n_devices: Optional[int] = None):
    """Clamp requested (dp, sp) to sizes that divide (batch, points) and fit
    the device count; dp=-1 means as many as possible."""
    n = n_devices if n_devices is not None else len(jax.devices())
    sp = max(1, int(sp))
    while sp > 1 and (n_points % sp or n % sp):
        sp -= 1
    dp = (n // sp) if (dp is None or dp <= 0) else int(dp)
    dp = max(1, min(dp, n // sp))
    while dp > 1 and batch_size % dp:
        dp -= 1
    return dp, sp


def make_mesh(dp: int = -1, sp: int = 1,
              devices=None) -> Optional[Mesh]:
    """Build a (data, points) mesh.  dp=-1 uses all remaining devices.
    Returns None for the trivial 1-device case (pure jit, no mesh)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sp = max(1, int(sp))
    if dp is None or dp <= 0:
        dp = n // sp
    dp = max(1, dp)
    if dp * sp > n:
        raise ValueError(f"mesh {dp}x{sp} needs {dp * sp} devices, "
                         f"have {n}")
    if dp * sp == 1:
        return None
    dev = np.asarray(devices[:dp * sp]).reshape(dp, sp)
    return Mesh(dev, axis_names=("data", "points"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N, ...) arrays: B over data, N over points."""
    return NamedSharding(mesh, P("data", "points"))


def batch_only_sharding(mesh: Mesh) -> NamedSharding:
    """(B, C) arrays: B over data, C replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Optional[Mesh]) -> dict:
    """Place a host batch dict onto the mesh with the right shardings."""
    if mesh is None:
        return jax.device_put(batch)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 3:
            out[k] = jax.device_put(v, batch_sharding(mesh))
        elif hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, batch_only_sharding(mesh))
        else:
            out[k] = v
    return out


def replicate_state(tree, mesh: Optional[Mesh]):
    if mesh is None:
        return tree
    sh = replicated(mesh)
    return jax.device_put(tree, sh)
