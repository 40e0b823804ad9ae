#!/usr/bin/env python
"""Distillation HARD case (VERDICT r2 #5, redesigned): classifier-free
GUIDANCE makes the sampling field genuinely curved — the CFG composite
``v_c + s (v_c - v_u)`` is not a rectified flow even when each branch is
straight — so few-step Euler measurably fails on a WELL-trained model,
and guided distillation (pcfm/distill/progressive.py guidance_scale)
closes the gap while also baking the guidance in (1 forward per eval
instead of the 2B CFG batch).

Reuses the gen-quality run's trained state (scripts/gen_quality_tpu.py
save_state pickle) instead of retraining: rebuild an identically
configured state and unravel the flat host vector into it.

Protocol (one clean-exiting TPU session):
  1. load the trained hybrid 2048-pt state (800-epoch gen-quality run);
  2. teacher serve path: latent heun x BASE + point heun x BASE at
     guidance G (the reference's Heun serve loop, train.py:409-415, plus
     the run's guidance setting);
  3. raw few-step: same z, point EULER x FEW at guidance G — the failure;
  4. guided-distilled student: point EULER x FEW at guidance 0;
  5. metrics: (a) endpoint CD vs the teacher's own output from identical
     priors/conds (trajectory fidelity), (b) the MMD/COV/1-NNA suite vs
     the held-out reference set.
Writes docs-ready numbers to OUT/result.json.
"""
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

STATE_PKL = os.environ.get("STATE_PKL",
                           "/tmp/pcfm_gen_quality4/state_latest.pkl")
EPOCHS = int(os.environ.get("EPOCHS", 800))      # run-4 settings (must
SIZE = int(os.environ.get("SIZE", 200))          # match the pickled state)
TEST = int(os.environ.get("TEST", 96))
N = int(os.environ.get("NPTS", 2048))
B = int(os.environ.get("BATCH", 16))
G = float(os.environ.get("GUIDANCE", 2.0))
BASE = int(os.environ.get("BASE", 48))           # teacher heun steps
PHASES = int(os.environ.get("PHASES", 3))        # 48 -> 24 -> 12 -> 6
DISTILL_STEPS = int(os.environ.get("DISTILL_STEPS", 300))
OUT = os.environ.get("OUT", "/tmp/pcfm_distill_guided")

float(jnp.sum(jnp.ones((8, 8))))
print("[dguided] device claimed:", jax.devices()[0], flush=True)

from pcfm.config import Config
from pcfm.data.synthetic import SyntheticDataset
from pcfm.distill.progressive import distill_pf
from pcfm.eval.metrics import generative_metrics
from pcfm.ops.chamfer import chamfer_l2
from pcfm.sample import get_sampler, make_latent_prior, make_pf_prior
from pcfm.train.evaluate import _cond_full, _lf_params, _pf_variables
from pcfm.train.state import init_state


def build_cfg():
    # EXACTLY scripts/gen_quality_tpu.py's run-4 Config (the pickled flat
    # vector only unravels into an identically-structured state)
    return Config(pf_backbone="hybrid", latent_dim=64, has_rgb=True,
                  cond_dim=1, pointflow_rgb=True, use_rgb_in_latent=True,
                  amp=True, use_bf16=True, tr_max_sample_points=N,
                  batch_size=B, epochs=EPOCHS, warmup_steps=200,
                  geom_warmup_epochs=20, cfg_drop_warmup_epochs=40,
                  ctx_stage_res=[32, 16, 8],
                  ctx_stage_channels=[128, 256, 256],
                  ctx_stage_blocks=[2, 2, 2],
                  sampler="heun", sample_steps=50, guidance_scale=G,
                  seed=7)


def main():
    os.makedirs(OUT, exist_ok=True)
    t_all = time.time()
    cfg = build_cfg()
    rng = jax.random.PRNGKey(cfg.seed)
    steps_per_epoch = SIZE // B
    bundle, state0, _ = init_state(cfg, rng,
                                   total_steps=EPOCHS * steps_per_epoch)
    with open(STATE_PKL, "rb") as f:
        saved = pickle.load(f)
    if isinstance(saved, dict):                 # flat-ravel format
        from jax.flatten_util import ravel_pytree
        flat0, unravel = ravel_pytree(state0)
        host = np.asarray(saved["flat"])
        assert host.shape == flat0.shape, (host.shape, flat0.shape)
        state = unravel(jax.device_put(jnp.asarray(host)))
        del flat0
    else:                                       # full host-side TrainState
        assert (jax.tree_util.tree_structure(saved)
                == jax.tree_util.tree_structure(state0)), "state mismatch"
        state = jax.device_put(saved)
    nbytes = sum(np.asarray(l).nbytes
                 for l in jax.tree_util.tree_leaves(saved)) \
        if not isinstance(saved, dict) else saved["flat"].nbytes
    del state0
    print(f"[dguided] state restored from {STATE_PKL} "
          f"({nbytes / 1e6:.0f} MB, step {int(state.step)}, "
          f"{time.time() - t_all:.0f}s)", flush=True)

    ds = SyntheticDataset(split="train", size=SIZE, n_points=N,
                          tr_sample_size=N, te_sample_size=N,
                          with_rgb=True, with_cond=True, seed=0)
    ds_te = SyntheticDataset(split="test", size=TEST, n_points=N,
                             tr_sample_size=N, te_sample_size=N,
                             with_rgb=True, with_cond=True, seed=0)
    pts_all = jax.device_put(jnp.asarray(np.stack(ds.clouds)))
    rgb_all = jax.device_put(jnp.asarray(np.stack(ds.rgbs)))
    cond_all = jax.device_put(jnp.asarray(ds.thetas)[:, None])
    te_pts = np.stack(ds_te.clouds)
    te_cond = jax.device_put(jnp.asarray(ds_te.thetas)[:, None])

    heun = get_sampler("heun")
    euler = get_sampler("euler")

    def split_sample(st, cond_j, key, pf_sampler, pf_steps, gscale,
                     pf_override=None):
        """Latent heun x BASE ALWAYS (isolates the point flow); the point
        integrator/steps/guidance vary per arm."""
        k_z, k_x = jax.random.split(key)
        b = cond_j.shape[0]
        z0 = make_latent_prior(k_z, b, cfg.latent_dim, cfg.latent_prior_std)
        lf_vf = bundle.lf_velocity_fn(_lf_params(st, True))
        z = heun(lf_vf, z0, BASE, cond=None, guidance_scale=0.0)
        cond_full = _cond_full(cfg, z, cond_j)
        if pf_override is not None:
            pf_p, pf_s = pf_override
        else:
            pf_p, pf_s = _pf_variables(st, True)
        vf = bundle.pf_velocity_fn(pf_p, pf_s)
        x0 = make_pf_prior(k_x, (b, N, cfg.pf_point_dim),
                           cfg.point_prior_std, cfg.color_prior,
                           cfg.color_prior_std)
        return pf_sampler(vf, x0, pf_steps, cond=cond_full,
                          guidance_scale=gscale)

    sample_jit = jax.jit(split_sample,
                         static_argnames=("pf_sampler", "pf_steps",
                                          "gscale"))

    def run_arm(name, pf_sampler, pf_steps, gscale, pf_override=None):
        gens = []
        for s0 in range(0, TEST, B):
            conds = te_cond[s0:s0 + B]
            pad = B - conds.shape[0]
            if pad:
                conds = jnp.concatenate(
                    [conds, jnp.zeros((pad, 1), conds.dtype)])
            x = sample_jit(state, conds, jax.random.fold_in(rng, 31_000 + s0),
                           pf_sampler, pf_steps, gscale, pf_override)
            gens.append(np.asarray(x)[:B - pad, :, :3])
        gen = np.concatenate(gens)[:TEST]
        suite = generative_metrics(gen, te_pts, metrics=("cd",))
        return gen, {k: round(float(v), 4) for k, v in suite.items()}

    t0 = time.time()
    gen_teacher, suite_teacher = run_arm("teacher", heun, BASE, G)
    print(f"[dguided] teacher heun x{BASE} g={G}: {suite_teacher} "
          f"({time.time() - t0:.0f}s)", flush=True)

    few = BASE // (2 ** PHASES)
    gen_raw, suite_raw = run_arm("raw", euler, few, G)
    ep_cd_raw = float(np.mean([
        float(jnp.mean(chamfer_l2(jnp.asarray(gen_raw[i:i + B]),
                                  jnp.asarray(gen_teacher[i:i + B]))))
        for i in range(0, TEST, B)]))
    print(f"[dguided] raw euler x{few} g={G}: {suite_raw}, endpoint CD vs "
          f"teacher {ep_cd_raw:.5f}", flush=True)

    def batches(phase):
        ph_r = np.random.RandomState(100 + phase)
        while True:
            idx = jnp.asarray(ph_r.randint(0, SIZE, size=B))
            yield {"pts": jnp.take(pts_all, idx, axis=0),
                   "rgb": jnp.take(rgb_all, idx, axis=0),
                   "cond": jnp.take(cond_all, idx, axis=0)}

    t0 = time.time()
    pf_params, pf_ema, out_steps = distill_pf(
        bundle, state, batches, base_steps=BASE, phases=PHASES,
        steps_per_phase=DISTILL_STEPS, lr=1e-4,
        rng=jax.random.PRNGKey(5), guidance_scale=G)
    assert out_steps == few
    print(f"[dguided] distilled in {time.time() - t0:.0f}s", flush=True)

    student = (pf_ema, state.ema_pf["batch_stats"])
    gen_dist, suite_dist = run_arm("distilled", euler, few, 0.0,
                                   pf_override=student)
    ep_cd_dist = float(np.mean([
        float(jnp.mean(chamfer_l2(jnp.asarray(gen_dist[i:i + B]),
                                  jnp.asarray(gen_teacher[i:i + B]))))
        for i in range(0, TEST, B)]))
    closure = (ep_cd_raw - ep_cd_dist) / max(ep_cd_raw, 1e-9)
    result = {
        "guidance": G, "base_steps": BASE, "few_steps": few,
        "nfe_teacher": 2 * BASE * 2,   # heun = 2 evals/step, CFG doubles
        "nfe_raw": few * 2,            # euler + CFG
        "nfe_distilled": few,          # euler, guidance baked in
        "suite_teacher": suite_teacher,
        "suite_raw_euler": suite_raw,
        "suite_distilled": suite_dist,
        "endpoint_cd_raw": round(ep_cd_raw, 5),
        "endpoint_cd_distilled": round(ep_cd_dist, 5),
        "endpoint_closure": round(float(closure), 3),
        "seconds": round(time.time() - t_all, 1),
    }
    print(f"[dguided] distilled euler x{few} g=0: {suite_dist}, endpoint "
          f"CD {ep_cd_dist:.5f} (closure {closure * 100:.0f}%)", flush=True)

    if os.environ.get("ABLATE_ROLLOUT"):
        # A/B the phase>=1 teacher rollout on the SAME state: re-distill
        # with the Salimans-Ho-faithful Euler (secant) rollout.  Measured
        # on the run-5 state (docs/genq/distill_guided6_run5_ab.json):
        # euler compounds the partially-distilled students' bias and
        # LOSES to the default Heun re-integration — 6-NFE 1-NNA 1.0 vs
        # 0.865, endpoint CD 0.00209 vs 0.00113.
        t0 = time.time()
        _, pf_ema_e, _ = distill_pf(
            bundle, state, batches, base_steps=BASE, phases=PHASES,
            steps_per_phase=DISTILL_STEPS, lr=1e-4,
            rng=jax.random.PRNGKey(5), guidance_scale=G,
            teacher_rollout="euler")
        gen_e, suite_e = run_arm(
            "distilled-euler-ablation", euler, few, 0.0,
            pf_override=(pf_ema_e, state.ema_pf["batch_stats"]))
        ep_cd_e = float(np.mean([
            float(jnp.mean(chamfer_l2(jnp.asarray(gen_e[i:i + B]),
                                      jnp.asarray(gen_teacher[i:i + B]))))
            for i in range(0, TEST, B)]))
        result["suite_distilled_euler_ablation"] = suite_e
        result["endpoint_cd_distilled_euler_ablation"] = round(ep_cd_e, 5)
        print(f"[dguided] ABLATION (euler secant-rollout recipe) euler "
              f"x{few} g=0: {suite_e}, endpoint CD {ep_cd_e:.5f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    with open(os.path.join(OUT, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(f"[dguided] {result}", flush=True)


if __name__ == "__main__":
    main()
