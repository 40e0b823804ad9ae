"""Multi-host initialization — the analogue of the reference's torchrun
NCCL bootstrap (util.py:71-90).

On TPU pods, `jax.distributed.initialize()` discovers the coordinator from
the TPU environment; for CPU/GPU test rigs the standard env vars
(COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) are honored.  After
init, data loading shards by `jax.process_index()` (the DataLoader rank),
and GSPMD handles every collective — there is no further "distributed"
code.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax


def init_distributed() -> Tuple[bool, int, int]:
    """Initialize multi-process JAX when the environment asks for it.

    Returns (is_distributed, process_index, process_count).

    NOTE: `jax.distributed.initialize` must run BEFORE anything that
    initializes the XLA backend — including `jax.process_count()` — so
    the environment is consulted first and the already-initialized case
    is detected by the initialize call itself (regression: the old
    process_count()-first guard broke every real multi-host bootstrap;
    caught by tests/test_multihost.py)."""
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("NUM_PROCESSES")
    if coord and nproc:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(os.environ.get("PROCESS_ID", 0)))
        except RuntimeError as e:                  # already initialized
            if "once" not in str(e):
                raise
        return True, jax.process_index(), jax.process_count()
    if os.environ.get("JAX_AUTO_DISTRIBUTED", "") == "1":
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            if "once" not in str(e):
                raise
        return jax.process_count() > 1, jax.process_index(), \
            jax.process_count()
    if jax.process_count() > 1:        # initialized earlier by the caller
        return True, jax.process_index(), jax.process_count()
    return False, 0, 1


def cleanup_distributed():
    """Tear down the distributed client (barrier happens implicitly on
    shutdown)."""
    try:
        jax.distributed.shutdown()
    except Exception:
        pass
