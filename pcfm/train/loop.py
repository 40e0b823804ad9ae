"""The full training loop — the equivalent of `train.py main()`
(train.py:86-715), TPU-native:

  * datasets + host-sharded prefetching loader
  * model bundle + TrainState + AdamW(3 groups) + EMA
  * orbax auto-resume
  * per-epoch: geometry-warmup and CFG-warmup scalars -> ONE jitted step
  * per-save_every: checkpoint + val recon/sample PLY dumps + CD prints
  * optional (data, points) mesh — GSPMD replaces DDP/NCCL
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pcfm.config import Config
from pcfm.data import DataLoader, get_datasets, to_model_batch
from pcfm.parallel import make_mesh, replicate_state, shard_batch
from pcfm.parallel.mesh import auto_mesh_sizes
from pcfm.train import checkpoint as ckpt
from pcfm.train.evaluate import (dump_clouds, make_recon_fn, make_sample_fn,
                                 val_cd)
from pcfm.train.state import count_parameters, init_state
from pcfm.train.step import make_train_step
from pcfm.utils import MetricEMA, seed_all


def device_prefetch(batches, mesh, cfg, depth: int = 2):
    """Start H2D transfers `depth` batches ahead so they overlap compute
    (jax.device_put is async) — the analogue of pin_memory+non_blocking.
    On tunneled dev TPUs the H2D link can be slower than the step itself;
    on real hardware this hides the copy entirely."""
    from collections import deque
    buf = deque()
    for batch in batches:
        mb = to_model_batch(batch, train=True, has_rgb=cfg.has_rgb,
                            cond_dim=cfg.cond_dim)
        buf.append(shard_batch(mb, mesh))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def epoch_scalars(cfg: Config, ep: int):
    """Geometry-warmup + CFG-dropout-warmup schedules (train.py:546,615)."""
    use_rgb = (ep > cfg.geom_warmup_epochs) and cfg.pointflow_rgb \
        and cfg.has_rgb
    color_on = jnp.float32(1.0 if use_rgb else 0.0)
    ramp = min(1.0, max(0.0, ep / max(1, cfg.cfg_drop_warmup_epochs)))
    drop_p = jnp.float32(cfg.cfg_drop_p * ramp if cfg.cfg_drop_p > 0 else 0.0)
    return color_on, drop_p


def train(cfg: Config, verbose: bool = True) -> dict:
    """Run training to cfg.epochs; returns summary metrics."""
    rank = jax.process_index()
    seed_all(cfg.seed + rank)
    if rank == 0:
        os.makedirs(cfg.out_dir, exist_ok=True)

    # ---- data (sets cfg.cond_dim / cfg.has_rgb) ----
    tr_ds, te_ds = get_datasets(cfg)
    dp, sp = auto_mesh_sizes(cfg.batch_size, cfg.tr_max_sample_points,
                             cfg.dp, cfg.sp)
    mesh = make_mesh(dp, sp)
    from pcfm.parallel.sp_context import set_sp_mesh
    set_sp_mesh(mesh)
    # loader sharding follows the MESH's data axis, not (rank, world):
    # with sp-across-hosts layouts the data axis does not cross processes
    # and every rank must feed the IDENTICAL batch (shard_batch presents
    # per-process batches as one global array — different per-rank data
    # would silently corrupt it); data_axis_shard collapses replicas onto
    # one shard index and counts only the distinct data shards
    from pcfm.parallel.mesh import data_axis_shard
    d_rank, d_world = data_axis_shard(mesh)
    from pcfm.data.grain_loader import make_loader
    train_loader = make_loader(cfg.loader_backend, tr_ds, cfg.batch_size,
                               shuffle=True, drop_last=True, seed=cfg.seed,
                               num_workers=cfg.num_workers, rank=d_rank,
                               world_size=d_world)
    val_loader = DataLoader(te_ds, cfg.batch_size, shuffle=False,
                            drop_last=False, seed=cfg.seed,
                            num_workers=max(1, cfg.num_workers // 2),
                            rank=d_rank, world_size=d_world)

    steps_per_epoch = max(1, len(train_loader))
    total_steps = cfg.epochs * steps_per_epoch

    # ---- models / state ----
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_key = jax.random.split(rng)
    bundle, state, tx = init_state(cfg, init_key, total_steps)
    if verbose and rank == 0:
        p = state.params
        print(f"[Models] enc: {count_parameters(p['enc'])/1e6:.2f}M  "
              f"pf: {count_parameters(p['pf'])/1e6:.2f}M  "
              f"lf: {count_parameters(p['lf'])/1e6:.2f}M")
        print(f"[Dims] cond_dim(joint)={cfg.cond_dim} "
              f"latent_dim={cfg.latent_dim} pf_cond_dim={cfg.pf_cond_dim} "
              f"enc_in={cfg.enc_in_channels} pf_point_dim={cfg.pf_point_dim}")
        if mesh is not None:
            print(f"[Mesh] {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    # ---- auto-resume ----
    state, start_epoch, _ = ckpt.auto_resume(cfg.out_dir, state,
                                             verbose=verbose and rank == 0)
    if start_epoch > cfg.epochs:
        if verbose and rank == 0:
            print("[Auto-Resume] Training already completed for the "
                  "requested total epochs. Nothing to do.")
        return {"epochs_run": 0}

    state = replicate_state(state, mesh)
    step_fn = make_train_step(bundle, tx, donate=cfg.donate)
    recon_fn = make_recon_fn(bundle)
    sample_fn = make_sample_fn(bundle)

    # fixed val batch for comparable visualizations (train.py:260-263)
    val_batch = next(iter(val_loader.epoch_batches(0)))

    lp_ema, lz_ema = MetricEMA(), MetricEMA()
    last_metrics = {}
    profiling = bool(cfg.profile_dir) and rank == 0
    global_step_seen = 0
    tb = None
    if cfg.tensorboard and rank == 0:
        from pcfm.utils.tb import SummaryWriter
        tb = SummaryWriter(os.path.join(cfg.out_dir, "tb"))

    for ep in range(start_epoch, cfg.epochs + 1):
        color_on, drop_p = epoch_scalars(cfg, ep)
        t_ep = time.perf_counter()
        n_steps = 0
        pbar = None
        if verbose and rank == 0:
            try:
                from tqdm import tqdm
                pbar = tqdm(total=len(train_loader), desc=f"Ep{ep}",
                            leave=False)
            except ImportError:
                pbar = None
        for mb in device_prefetch(train_loader.epoch_batches(ep), mesh, cfg):
            rng, sk = jax.random.split(rng)
            if profiling and global_step_seen == 1:
                # skip step 0 (compile); trace a few steady-state steps
                jax.profiler.start_trace(cfg.profile_dir)
            state, metrics = step_fn(state, mb, sk, color_on, drop_p)
            n_steps += 1
            global_step_seen += 1
            if pbar is not None:
                if n_steps % max(1, cfg.log_every) == 0:
                    # sync sparsely; per-step device syncs would stall
                    pbar.set_postfix(
                        lp=float(metrics["loss_point"]),
                        lz=float(metrics["loss_latent"]))
                pbar.update(1)
            if profiling and global_step_seen == 1 + cfg.profile_steps:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()
                profiling = False
                print(f"[profile] trace written to {cfg.profile_dir}")
        if pbar is not None:
            pbar.close()
        if n_steps == 0:
            raise ValueError(
                f"epoch {ep} produced no batches: dataset has "
                f"{len(train_loader.ds)} items < batch_size "
                f"{cfg.batch_size} (drop_last). Lower --batch_size or "
                f"add data.")
        # sync once per epoch for the metric prints
        last_metrics = {k: float(v) for k, v in metrics.items()}
        lp_ema.update(last_metrics["loss_point"])
        lz_ema.update(last_metrics["loss_latent"])
        dt = time.perf_counter() - t_ep
        pps = cfg.batch_size * cfg.tr_max_sample_points * n_steps / dt
        if rank == 0:
            # per-epoch metrics log (observability; the reference only has
            # tqdm postfix prints)
            import json
            with open(os.path.join(cfg.out_dir, "metrics.jsonl"), "a") as f:
                json.dump({"epoch": ep, "sec": round(dt, 3),
                           "points_per_sec": round(pps, 1),
                           **{k: round(v, 6)
                              for k, v in last_metrics.items()}}, f)
                f.write("\n")
            if tb is not None:
                tb.add_scalars({f"train/{k}": v
                                for k, v in last_metrics.items()}
                               | {"perf/sec_per_epoch": dt,
                                  "perf/points_per_sec": pps}, ep)
                tb.flush()
        if verbose and rank == 0:
            print(f"Ep{ep}: lp={last_metrics['loss_point']:.4f} "
                  f"lz={last_metrics['loss_latent']:.4f} "
                  f"(ema {lp_ema.value:.4f}/{lz_ema.value:.4f}, "
                  f"{dt:.1f}s, {pps/1e6:.2f}M pts/s)")

        if (ep % cfg.save_every) == 0 or ep == cfg.epochs:
            if rank == 0:
                ckpt.save(cfg.out_dir, ep, state, cfg,
                          async_save=cfg.async_save)
            cd_rec, cd_gen = run_validation(cfg, bundle, state, recon_fn,
                                            sample_fn, val_batch, ep, rng,
                                            rank, verbose, mesh=mesh)
            if tb is not None and cd_rec is not None:
                tb.add_scalars({"val/recon_cd": cd_rec,
                                "val/gen_cd": cd_gen}, ep)
                tb.flush()

    if tb is not None:
        tb.close()
    ckpt.wait_for_saves()
    if rank == 0 and cfg.keep_last_ckpts > 0:
        # async saves GC one behind (the in-flight dir only counts once
        # committed); a final pass enforces exactly K on disk
        ckpt.gc_old(cfg.out_dir, cfg.keep_last_ckpts)
    return {"epochs_run": cfg.epochs - start_epoch + 1, **last_metrics}


def run_validation(cfg, bundle, state, recon_fn, sample_fn, val_batch, ep,
                   rng, rank, verbose=True, mesh=None):
    """save_val_recon + save_val_samples (train.py:283-429).

    Multi-host: the reference runs the fixed-batch val dumps on rank 0
    under DDP every save_every (train.py:707-712).  Here the state lives
    on the GLOBAL mesh, so every process must participate in the jitted
    computation: the per-rank fixed val batches are allgathered into one
    identical global batch (it is a single batch — process_allgather is
    cheap), the recon/sample fns run SPMD over the mesh, and the global
    outputs are gathered back for the rank-0 PLY/CD artifacts."""
    multi = jax.process_count() > 1
    gt_host = None
    if multi:
        from jax.experimental import multihost_utils

        def _gather(v):
            if v is None:
                return None
            return multihost_utils.process_allgather(
                np.asarray(v, np.float32), tiled=True)

        pts_h = _gather(val_batch["test_points"])
        rgb_h = _gather(val_batch.get("test_rgb"))
        cond_h = _gather(val_batch.get("cond"))
        dp_size = int(mesh.shape.get("data", 1)) if mesh is not None else 1
        real = pts_h.shape[0]          # rows that are actual val clouds
        if real >= dp_size:
            keep = real - real % dp_size
            real = keep
        else:
            # gathered batch smaller than the data axis: tile rows up to
            # dp_size so the global array is constructible; the padded
            # duplicates are dropped again before dumps/CD
            keep = dp_size
            reps = -(-dp_size // pts_h.shape[0])

            def _tile(v):
                return None if v is None else np.concatenate(
                    [v] * reps)[:dp_size]

            pts_h, rgb_h, cond_h = _tile(pts_h), _tile(rgb_h), _tile(cond_h)

        def _put(v, ndim3: bool):
            # the gathered batch is IDENTICAL on every process, so build
            # the global array with global_shape == local shape (JAX's
            # replicas-hold-the-same-data construction) — shard_batch
            # would re-concatenate it across the data-axis process span
            if v is None:
                return None
            from pcfm.parallel.mesh import (batch_only_sharding,
                                            batch_sharding)
            if mesh is None:
                return jnp.asarray(v)
            sh = batch_sharding(mesh) if ndim3 else batch_only_sharding(mesh)
            return jax.make_array_from_process_local_data(sh, v, v.shape)

        pts = _put(pts_h[:keep], True)
        rgb = _put(rgb_h[:keep] if rgb_h is not None else None, True)
        cond_j = _put(cond_h[:keep] if cond_h is not None else None, False)
        gt_host = (pts_h[:real],
                   rgb_h[:real] if rgb_h is not None else None)
    else:
        pts = jnp.asarray(val_batch["test_points"], jnp.float32)
        rgb = val_batch.get("test_rgb")
        rgb = jnp.asarray(rgb, jnp.float32) if rgb is not None else None
        cond_j = val_batch.get("cond")
        cond_j = jnp.asarray(cond_j, jnp.float32) if cond_j is not None \
            else None
    b, n = pts.shape[:2]
    k1, k2 = jax.random.split(jax.random.fold_in(rng, ep))

    x_rec = recon_fn(state, pts, rgb, cond_j, k1)
    x_gen = sample_fn(state, cond_j, k2, b, n)

    if multi:
        from jax.experimental import multihost_utils
        # outputs may be sharded over non-addressable devices; gather the
        # full global value on every process, then rank 0 writes/prints
        x_rec = multihost_utils.process_allgather(x_rec, tiled=True)
        x_gen = multihost_utils.process_allgather(x_gen, tiled=True)

    if rank == 0:
        if multi:
            gt_pts, gt_rgb = gt_host
        else:
            gt_pts = np.asarray(pts)
            gt_rgb = np.asarray(rgb) if rgb is not None else None
        rec_np = np.asarray(x_rec)[:len(gt_pts)]   # drop tile padding
        gen_np = np.asarray(x_gen)[:len(gt_pts)]
        dump_clouds(rec_np, gt_pts, gt_rgb,
                    os.path.join(cfg.out_dir, f"samples_recon_ep{ep:04d}"),
                    cfg.vis_count)
        dump_clouds(gen_np, gt_pts, gt_rgb,
                    os.path.join(cfg.out_dir, f"samples_ep{ep:04d}"),
                    cfg.vis_count)
        # CD on host copies: rank 0 computes alone, so it must not launch
        # a global-mesh computation the other ranks aren't running
        cd_rec = val_cd(jnp.asarray(rec_np), jnp.asarray(gt_pts))
        cd_gen = val_cd(jnp.asarray(gen_np), jnp.asarray(gt_pts))
        if verbose:
            print(f"[Val-Recon ep{ep:04d}] CD = {cd_rec:.4f} "
                  f"(EMA={cfg.ema_eval}, {cfg.sampler})")
            print(f"[Val ep{ep:04d}] random-z CD = {cd_gen:.4f} "
                  f"(EMA={cfg.ema_eval}, {cfg.sampler})")
        return cd_rec, cd_gen
    return None, None
