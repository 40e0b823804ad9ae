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


def _data_axis_groups(devices: np.ndarray, axis_names) -> tuple[dict, list]:
    """Group processes by WHICH data-axis positions their devices occupy.

    Returns (proc -> position-set, ordered distinct position-sets).  Two
    processes with the same position-set are data-axis REPLICAS (they must
    feed identical loader batches); distinct position-sets are the data
    shards.  Raises if the sets overlap without being equal — such a
    layout cannot be fed by per-process loader batches at all."""
    ax = list(axis_names).index("data")
    ndata = devices.shape[ax]
    rows = np.moveaxis(devices, ax, 0).reshape(ndata, -1)
    by_proc: dict = {}
    for i in range(ndata):
        for d in rows[i]:
            by_proc.setdefault(d.process_index, set()).add(i)
    keys = sorted({frozenset(v) for v in by_proc.values()}, key=min)
    seen: set = set()
    for k in keys:
        if seen & k:
            raise ValueError(
                "data mesh axis has processes with overlapping but unequal "
                f"position sets ({[sorted(k) for k in keys]}); rank-sharded "
                "loading is ill-defined for this device layout")
        seen |= k
    return by_proc, keys


def data_axis_process_span(mesh: Mesh) -> int:
    """How many distinct data shards the ``data`` mesh axis crosses
    process boundaries into (1 when every process sees every data-axis
    position, e.g. the transposed sp-across-hosts layout).  This is the
    factor by which rank-sharded loader batches concatenate into the
    global batch: global_B = local_B * span."""
    _, keys = _data_axis_groups(mesh.devices, mesh.axis_names)
    return len(keys)


def data_axis_shard(mesh: Optional[Mesh]) -> tuple[int, int]:
    """(shard_index, num_shards) this process's loader must use.

    The DistributedSampler analogue derived from the MESH, not from
    (process_index, process_count): processes whose devices occupy the
    same data-axis positions are replicas along data (sp-across-hosts)
    and must load IDENTICAL batches — so they share a shard index — while
    processes on distinct positions take distinct dataset shards.  With a
    data axis that crosses all processes this reduces to the usual
    (rank, world)."""
    if mesh is None or jax.process_count() == 1:
        return 0, 1
    by_proc, keys = _data_axis_groups(mesh.devices, mesh.axis_names)
    me = by_proc.get(jax.process_index())
    if me is None:
        # this process owns no device on the mesh (not an SPMD participant)
        return 0, len(keys)
    return keys.index(frozenset(me)), len(keys)


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
