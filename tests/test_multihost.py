"""Real multi-process test of pcfm.parallel.distributed: two CPU
processes form a JAX distributed cluster (gloo collectives), build the
(data,) mesh over the GLOBAL device set, and run a psum + one DP train
step with host-sharded batches — the torchrun/NCCL analogue end-to-end."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from pcfm.parallel.distributed import init_distributed, cleanup_distributed

dist, rank, world = init_distributed()
assert dist and world == 2, (dist, rank, world)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()                      # global: 2 procs x 2 local
assert len(devs) == 4, devs
mesh = Mesh(devs, ("data",))

# cross-process psum via a sharded sum: each process contributes its own
# local shard values
import numpy as np
local = np.full((2, 4), float(rank + 1), np.float32)   # proc r -> r+1
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (4, 4))
total = float(jax.jit(lambda x: jnp.sum(x),
                      out_shardings=NamedSharding(mesh, P()))(arr))
assert total == (1 + 1 + 2 + 2) * 4.0, total

# one DP train step over the global mesh, rank-sharded batch
from pcfm.config import Config
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step
from pcfm.parallel import replicate_state, shard_batch

cfg = Config(dataset_type="synthetic", pf_backbone="mlp", latent_dim=8,
             enc_width=8, enc_depth=4, pf_width=16, pf_depth=3,
             pf_emb_dim=8, lf_width=16, lf_depth=3, lf_emb_dim=8,
             warmup_steps=0, amp=False, batch_size=4,
             tr_max_sample_points=16, geom_warmup_epochs=0,
             cond_dim=0, has_rgb=False)
bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 10)
state = replicate_state(state, mesh)
step = make_train_step(bundle, tx, donate=False)
key = jax.random.PRNGKey(rank)
import numpy as np
local_pts = np.random.RandomState(rank).randn(2, 16, 3).astype(np.float32)
batch = {"pts": jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local_pts, (4, 16, 3))}
state, m = step(state, batch, jax.random.PRNGKey(7), jnp.float32(0.0),
                jnp.float32(0.0))
loss = float(m["loss"])
assert np.isfinite(loss), loss
print(f"OK rank={rank} loss={loss:.4f}", flush=True)
cleanup_distributed()
"""


_WORKER_SP = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from pcfm.parallel.distributed import init_distributed, cleanup_distributed

dist, rank, world = init_distributed()
assert dist and world == 2, (dist, rank, world)
import jax.numpy as jnp
from jax.sharding import Mesh

devs = jax.devices()
assert len(devs) == 4, devs
# TRANSPOSED layout: the points axis pairs one device from EACH process,
# so the sp voxel-grid psum is a real cross-host collective (gloo), not
# an intra-process shortcut.  data axis stays within a process.
mesh = Mesh(np.asarray(devs).reshape(2, 2).T, axis_names=("data", "points"))

from pcfm.config import Config
from pcfm.parallel import replicate_state, shard_batch
from pcfm.parallel.sp_context import set_sp_mesh
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step
import pcfm.nn.pvconv as pvc

pvc.SORTED_N_MIN = 0            # tiny shapes still route through the
                                # sorted kernels (interpret mode on CPU)
set_sp_mesh(mesh)
try:
    cfg = Config(dataset_type="synthetic", pf_backbone="hybrid",
                 latent_dim=8, enc_width=8, enc_depth=4, pf_width=16,
                 pf_depth=3, pf_emb_dim=8, lf_width=16, lf_depth=3,
                 lf_emb_dim=8, ctx_dim=8, ctx_emb_dim=8,
                 ctx_stage_channels=[8], ctx_stage_blocks=[1],
                 ctx_stage_res=[16], voxel_backend="sorted",
                 warmup_steps=0, amp=False, batch_size=4,
                 tr_max_sample_points=64, geom_warmup_epochs=0,
                 cond_dim=0, has_rgb=False, dp=2, sp=2)
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 10)
    state = replicate_state(state, mesh)
    step = make_train_step(bundle, tx, donate=False)
    # identical global batch on both ranks; shard_batch places shards
    pts = np.random.RandomState(0).randn(4, 64, 3).astype(np.float32)
    batch = shard_batch({"pts": jnp.asarray(pts)}, mesh)
    state, m = step(state, batch, jax.random.PRNGKey(7), jnp.float32(0.0),
                    jnp.float32(0.0))
    loss = float(m["loss"])
    assert np.isfinite(loss), loss
    print(f"OK rank={rank} loss={loss:.4f}", flush=True)
finally:
    set_sp_mesh(None)
cleanup_distributed()
"""


_WORKER_VAL = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from pcfm.parallel.distributed import init_distributed, cleanup_distributed

dist, rank, world = init_distributed()
assert dist and world == 2, (dist, rank, world)
from pcfm.config import Config
from pcfm.train.loop import train

cfg = Config(dataset_type="synthetic", pf_backbone="mlp", latent_dim=8,
             enc_width=8, enc_depth=4, pf_width=16, pf_depth=3,
             pf_emb_dim=8, lf_width=16, lf_depth=3, lf_emb_dim=8,
             warmup_steps=0, amp=False, batch_size=4,
             tr_max_sample_points=32, te_max_sample_points=32,
             geom_warmup_epochs=0, epochs=1, save_every=1,
             sample_steps=2, vis_count=2, num_workers=0,
             async_save=False, out_dir=os.environ["OUT_DIR"])
res = train(cfg, verbose=True)
print(f"DONE rank={rank} epochs={res['epochs_run']}", flush=True)
cleanup_distributed()
"""


def test_two_process_dp_step(tmp_path):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "COORDINATOR_ADDRESS": f"localhost:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(rank),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank={rank}" in out, out
    # identical replicated loss on both ranks (global-batch semantics)
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)


def test_two_process_sp_sorted_step(tmp_path):
    """Cross-host SEQUENCE parallelism: (data=2, points=2) mesh with the
    point axis spanning the two processes; the hybrid sorted-kernel voxel
    path's grid psum rides the gloo collective. Replicated loss must be
    identical on both ranks."""
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "COORDINATOR_ADDRESS": f"localhost:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(rank),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER_SP], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank={rank}" in out, out
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)


def test_two_process_inloop_validation(tmp_path):
    """The full train loop on a 2-process cluster must run the in-loop
    recon/sample validation (reference behavior train.py:707-712) instead
    of skipping it: the fixed val batches are allgathered, recon/sample
    run SPMD over the global mesh, and rank 0 writes the same PLY/CD
    artifacts a single-host run produces (VERDICT r3 missing #3)."""
    port = _free_port()
    out_dir = str(tmp_path / "run")
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "COORDINATOR_ADDRESS": f"localhost:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(rank),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "OUT_DIR": out_dir,
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER_VAL], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"DONE rank={rank}" in out, out
    # rank 0 printed real CD values (not the old skip message)
    assert "[Val-Recon ep0001]" in outs[0], outs[0]
    assert "skipped in-loop validation" not in outs[0]
    # and wrote the PLY artifacts
    rec = os.path.join(out_dir, "samples_recon_ep0001")
    gen = os.path.join(out_dir, "samples_ep0001")
    for d in (rec, gen):
        assert os.path.isfile(os.path.join(d, "pred_0.ply")), \
            sorted(os.listdir(out_dir))
        assert os.path.isfile(os.path.join(d, "gt_0.ply"))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
