#!/usr/bin/env python
"""Distillation on a HARD case (VERDICT r2 weak #6): a short-trained
teacher whose flows are still curved, where raw few-step Euler measurably
fails — and progressive distillation closes the gap.

Protocol (one clean-exiting TPU session):
  1. train the mlp point-flow for a deliberately SHORT run (default 30
     epochs, 2048 pts) — rectified flows straighten with training, so an
     undertrained teacher has curved trajectories;
  2. eval EMA recon CD with (a) teacher Heun x STEPS, (b) raw Euler x
     STEPS/8 — the failure case, (c) progressively distilled student
     (3 halvings: STEPS -> STEPS/8) at Euler x STEPS/8;
  3. write docs-ready numbers to OUT/result.json. Gap closure
     = (raw - distilled) / (raw - teacher).

Matches the sampler NFE economics of reference train.py:332-341.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

EPOCHS = int(os.environ.get("EPOCHS", 30))
SIZE = int(os.environ.get("SIZE", 128))
N = int(os.environ.get("NPTS", 2048))
B = int(os.environ.get("BATCH", 16))
STEPS = int(os.environ.get("STEPS", 48))
PHASES = int(os.environ.get("PHASES", 3))
DISTILL_STEPS = int(os.environ.get("DISTILL_STEPS", 300))
LATENT = int(os.environ.get("LATENT", 64))
OUT = os.environ.get("OUT", "/tmp/pcfm_distill_hard")

float(jnp.sum(jnp.ones((8, 8))))
print("[dhard] device claimed:", jax.devices()[0], flush=True)

from pcfm.config import Config
from pcfm.data.synthetic import SyntheticDataset
from pcfm.distill.progressive import distill_pf
from pcfm.ops.chamfer import chamfer_l2
from pcfm.train.evaluate import make_recon_fn
from pcfm.train.state import ModelBundle, init_state
from pcfm.train.step import make_train_step


def main():
    os.makedirs(OUT, exist_ok=True)
    t_all = time.time()
    ds = SyntheticDataset(split="train", size=SIZE, n_points=N,
                          tr_sample_size=N, te_sample_size=N,
                          with_rgb=False, with_cond=True, seed=0)
    ds_te = SyntheticDataset(split="test", size=B, n_points=N,
                             tr_sample_size=N, te_sample_size=N,
                             with_rgb=False, with_cond=True, seed=0)
    pts_all = jax.device_put(jnp.asarray(np.stack(ds.clouds)))
    cond_all = jax.device_put(jnp.asarray(ds.thetas)[:, None])
    te_pts = jax.device_put(jnp.asarray(np.stack(ds_te.clouds)))
    te_cond = jax.device_put(jnp.asarray(ds_te.thetas)[:, None])

    steps_per_epoch = SIZE // B
    cfg = Config(pf_backbone="mlp", latent_dim=LATENT, has_rgb=False,
                 cond_dim=1, pointflow_rgb=False, use_rgb_in_latent=False,
                 amp=True, use_bf16=True, tr_max_sample_points=N,
                 batch_size=B, epochs=EPOCHS, warmup_steps=100,
                 geom_warmup_epochs=0, cfg_drop_warmup_epochs=10,
                 sampler="heun", sample_steps=STEPS, seed=11)
    rng = jax.random.PRNGKey(cfg.seed)
    bundle, state, tx = init_state(cfg, rng,
                                   total_steps=EPOCHS * steps_per_epoch)
    step = make_train_step(bundle, tx, donate=False)

    npr = np.random.RandomState(2)
    gstep = 0
    for ep in range(1, EPOCHS + 1):
        order = npr.permutation(SIZE)[:steps_per_epoch * B]
        dp = jnp.float32(cfg.cfg_drop_p * min(1.0, ep / 10))
        for si in range(steps_per_epoch):
            idx = jnp.asarray(order[si * B:(si + 1) * B])
            batch = {"pts": jnp.take(pts_all, idx, axis=0),
                     "cond": jnp.take(cond_all, idx, axis=0)}
            state, m = step(state, batch, jax.random.fold_in(rng, gstep),
                            jnp.float32(1.0), dp)
            gstep += 1
    print(f"[dhard] teacher trained: {EPOCHS} ep, "
          f"lp={float(m['loss_point']):.4f} ({time.time() - t_all:.0f}s)",
          flush=True)

    def recon_cd(st, sampler, steps):
        b2 = ModelBundle(cfg.replace(sampler=sampler, sample_steps=steps))
        fn = make_recon_fn(b2, use_ema=True)
        x = fn(st, te_pts, None, te_cond, jax.random.PRNGKey(99))
        return float(jnp.mean(chamfer_l2(
            x[..., :3].astype(jnp.float32), te_pts)))

    few = STEPS // (2 ** PHASES)
    cd_teacher = recon_cd(state, "heun", STEPS)
    cd_raw = recon_cd(state, "euler", few)
    print(f"[dhard] teacher heun x{STEPS}: CD {cd_teacher:.5f}; "
          f"raw euler x{few}: CD {cd_raw:.5f}", flush=True)

    def batches(phase):
        ph_r = np.random.RandomState(100 + phase)
        while True:
            idx = jnp.asarray(ph_r.randint(0, SIZE, size=B))
            yield {"pts": jnp.take(pts_all, idx, axis=0),
                   "cond": jnp.take(cond_all, idx, axis=0)}

    pf_params, pf_ema, out_steps = distill_pf(
        bundle, state, batches, base_steps=STEPS, phases=PHASES,
        steps_per_phase=DISTILL_STEPS, lr=1e-4,
        rng=jax.random.PRNGKey(5))
    assert out_steps == few
    dstate = state.replace(
        params={**state.params, "pf": pf_params},
        ema_pf={"params": pf_ema,
                "batch_stats": state.ema_pf["batch_stats"]})
    cd_distilled = recon_cd(dstate, "euler", few)
    closure = (cd_raw - cd_distilled) / max(cd_raw - cd_teacher, 1e-9)
    result = {"epochs": EPOCHS, "n_points": N, "steps_teacher": STEPS,
              "steps_few": few,
              "cd_teacher_heun": round(cd_teacher, 5),
              "cd_raw_euler_few": round(cd_raw, 5),
              "cd_distilled_euler_few": round(cd_distilled, 5),
              "gap_closure": round(float(closure), 3),
              "seconds": round(time.time() - t_all, 1)}
    print(f"[dhard] distilled euler x{few}: CD {cd_distilled:.5f} "
          f"(gap closure {closure * 100:.0f}%)", flush=True)
    with open(os.path.join(OUT, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(f"[dhard] {result}", flush=True)


if __name__ == "__main__":
    main()
