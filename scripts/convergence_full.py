#!/usr/bin/env python
"""Full-size convergence run: hybrid backbone at the reference workload
shape (20k points, batch 8, latent 128) on ONE chip, with device-resident
synthetic data (this dev box's H2D tunnel is ~10 MB/s — CLAUDE.md — so the
whole 256-cloud split is uploaded once and batches are gathered on
device).  Records the recon-CD trajectory + loss curve, dumps sample PLYs,
and appends the table to docs/convergence.md.

Single clean-exiting TPU session; EPOCHS / EVAL_EVERY via env.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

EPOCHS = int(os.environ.get("EPOCHS", 60))
EVAL_EVERY = int(os.environ.get("EVAL_EVERY", 5))
SIZE = int(os.environ.get("SIZE", 256))
N = int(os.environ.get("NPTS", 20000))
B = int(os.environ.get("BATCH", 8))
OUT = os.environ.get("OUT", "/tmp/pcfm_conv_full")

float(jnp.sum(jnp.ones((8, 8))))
print("[conv] device claimed:", jax.devices()[0], flush=True)

from pcfm.config import Config
from pcfm.data.synthetic import SyntheticDataset
from pcfm.ops.chamfer import chamfer_l2
from pcfm.train.evaluate import make_recon_fn
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step
from pcfm.utils import save_point_cloud_ply_rgb


def main():
    os.makedirs(OUT, exist_ok=True)
    t_all = time.time()
    ds = SyntheticDataset(split="train", size=SIZE, n_points=N,
                          tr_sample_size=N, te_sample_size=N,
                          with_rgb=True, with_cond=True, seed=0)
    ds_te = SyntheticDataset(split="test", size=16, n_points=N,
                             tr_sample_size=N, te_sample_size=N,
                             with_rgb=True, with_cond=True, seed=0)
    pts_all = jax.device_put(jnp.asarray(np.stack(ds.clouds)))
    rgb_all = jax.device_put(jnp.asarray(np.stack(ds.rgbs)))
    cond_all = jax.device_put(jnp.asarray(ds.thetas)[:, None])
    te_pts = jax.device_put(jnp.asarray(np.stack(ds_te.clouds)[:B]))
    te_rgb = jax.device_put(jnp.asarray(np.stack(ds_te.rgbs)[:B]))
    te_cond = jax.device_put(jnp.asarray(ds_te.thetas[:B])[:, None])
    print(f"[conv] data on device: {SIZE}x{N} pts "
          f"({pts_all.nbytes/1e6:.0f} MB)", flush=True)

    steps_per_epoch = SIZE // B
    cfg = Config(pf_backbone="hybrid", latent_dim=128, has_rgb=True,
                 cond_dim=1, pointflow_rgb=True, use_rgb_in_latent=True,
                 amp=True, use_bf16=True, tr_max_sample_points=N,
                 batch_size=B, epochs=EPOCHS, warmup_steps=200,
                 geom_warmup_epochs=5, cfg_drop_warmup_epochs=10,
                 sampler="heun", sample_steps=25, seed=7,
                 pf_film_every=int(os.environ.get("FILM_EVERY", 1)))
    rng = jax.random.PRNGKey(cfg.seed)
    bundle, state, tx = init_state(cfg, rng,
                                   total_steps=EPOCHS * steps_per_epoch)
    step = make_train_step(bundle, tx, donate=True)
    recon = make_recon_fn(bundle)

    @jax.jit
    def gather_batch(idx):
        return (jnp.take(pts_all, idx, axis=0),
                jnp.take(rgb_all, idx, axis=0),
                jnp.take(cond_all, idx, axis=0))

    npr = np.random.RandomState(1)
    hist = []
    t0 = time.time()
    gstep = 0
    for ep in range(1, EPOCHS + 1):
        order = npr.permutation(SIZE)[:steps_per_epoch * B]
        color_on = jnp.float32(1.0 if ep > cfg.geom_warmup_epochs else 0.0)
        dp = jnp.float32(cfg.cfg_drop_p * min(
            1.0, ep / max(1, cfg.cfg_drop_warmup_epochs)))
        lp = lz = 0.0
        for si in range(steps_per_epoch):
            idx = jnp.asarray(order[si * B:(si + 1) * B])
            p, r, c = gather_batch(idx)
            batch = {"pts": p, "rgb": r, "cond": c}
            state, m = step(state, batch, jax.random.fold_in(rng, gstep),
                            color_on, dp)
            gstep += 1
            if si >= steps_per_epoch - 2:          # late-epoch metric read
                lp += float(m["loss_point"]) / 2
                lz += float(m["loss_latent"]) / 2
        row = {"epoch": ep, "loss_point": round(lp, 4),
               "loss_latent": round(lz, 4),
               "elapsed_s": round(time.time() - t0, 1)}
        if ep % EVAL_EVERY == 0 or ep == EPOCHS:
            x = recon(state, te_pts, te_rgb, te_cond,
                      jax.random.fold_in(rng, 10_000_000 + ep))
            cd = chamfer_l2(x[..., :3].astype(jnp.float32), te_pts)  # (B,)
            row["recon_cd"] = round(float(jnp.mean(cd)), 4)
        hist.append(row)
        print(f"[conv] {row}", flush=True)
        with open(os.path.join(OUT, "history.json"), "w") as f:
            json.dump(hist, f, indent=1)

    # final sample dumps
    x = recon(state, te_pts, te_rgb, te_cond, jax.random.fold_in(rng, 42))
    x = np.asarray(x, np.float32)
    for i in range(min(4, B)):
        if x.shape[-1] == 6:
            save_point_cloud_ply_rgb(x[i, :, :3],
                                     np.clip(x[i, :, 3:6], 0, 1),
                                     os.path.join(OUT, f"recon_{i}.ply"))
        else:
            from pcfm.utils import save_point_cloud_ply
            save_point_cloud_ply(x[i, :, :3],
                                 os.path.join(OUT, f"recon_{i}.ply"))
        save_point_cloud_ply_rgb(np.asarray(te_pts[i]),
                                 np.asarray(te_rgb[i]),
                                 os.path.join(OUT, f"gt_{i}.ply"))
    print(f"[conv] total {time.time() - t_all:.0f}s; PLYs + history in "
          f"{OUT}", flush=True)


if __name__ == "__main__":
    main()
