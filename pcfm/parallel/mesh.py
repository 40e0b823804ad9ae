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


def data_axis_process_span(mesh: Mesh) -> int:
    """How many distinct processes the ``data`` mesh axis crosses (1 when
    the axis lives entirely within each process).  This is the factor by
    which rank-sharded loader batches concatenate into the global batch:
    global_B = local_B * span."""
    ax = mesh.axis_names.index("data")
    col = np.moveaxis(mesh.devices, ax, 0).reshape(
        mesh.devices.shape[ax], -1)[:, 0]
    return len({d.process_index for d in col})


def shard_batch(batch: dict, mesh: Optional[Mesh]) -> dict:
    """Place a host batch dict onto the mesh with the right shardings.

    Multi-process: each process passes its OWN loader batch (the
    rank-sharded sub-batch — the DistributedSampler analogue) and the
    global batch is their concatenation along dim 0 when the data axis
    spans processes.  When the data axis lives within each process (e.g.
    the transposed sp-across-hosts layout), processes are replicas on the
    batch dim and must pass identical batches.  Non-batch dims are always
    host-complete (each process loads full points; the points axis slice
    is taken locally)."""
    if mesh is None:
        return jax.device_put(batch)
    multi = jax.process_count() > 1
    span = data_axis_process_span(mesh) if multi else 1
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "ndim") or v.ndim < 1:
            out[k] = v
            continue
        sh = batch_sharding(mesh) if v.ndim >= 3 \
            else batch_only_sharding(mesh)
        if multi:
            gshape = (v.shape[0] * span,) + tuple(v.shape[1:])
            out[k] = jax.make_array_from_process_local_data(
                sh, np.asarray(v), gshape)
        else:
            out[k] = jax.device_put(v, sh)
    return out


def replicate_state(tree, mesh: Optional[Mesh]):
    if mesh is None:
        return tree
    sh = replicated(mesh)
    return jax.device_put(tree, sh)
