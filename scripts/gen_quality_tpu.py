#!/usr/bin/env python
"""Generative-quality hardware run (VERDICT r2 #3): train the flagship
hybrid backbone on the 2048-pt synthetic workload long enough for the
latent-flow -> point-flow pipeline to MATCH the data distribution, and
track the MMD/COV/1-NNA suite; the report target is 1-NNA <= 0.75 and
COV >= 0.4 (PointFlow protocol; reference intent train.py:359-429
save_val_samples), while the in-loop early stop deliberately uses the
STRICTER 1-NNA <= 0.70 / COV >= 0.45 so a run keeps improving past the
bare target until its time budget runs out.

Device-resident data (dev-tunnel H2D is ~10 MB/s); ONE clean-exiting TPU
session; suite evaluated every EVAL_EVERY epochs on conditioned samples
(one generated cloud per test cloud, same conds — the eval CLI's suite
protocol). Appends history to OUT/history.json and dumps sample PLYs.
"""
import dataclasses
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

EPOCHS = int(os.environ.get("EPOCHS", 400))
EVAL_EVERY = int(os.environ.get("EVAL_EVERY", 25))
# state-pickle save interval (epochs). The save is a full device->host
# readback of the train state over the dev tunnel — measured 700-1400 s
# for the 1.27 GB run7 state — so it is decoupled from the (cheap) suite
# eval; default keeps the old save-at-every-eval behavior.
SAVE_EVERY = int(os.environ.get("SAVE_EVERY", 0)) or EVAL_EVERY
SIZE = int(os.environ.get("SIZE", 200))
# default protocol (r4): 192-cloud reference set — halves 1-NNA variance
# vs the 96-cloud runs 4/5 (ROADMAP #20)
TEST = int(os.environ.get("TEST", 192))
N = int(os.environ.get("NPTS", 2048))
B = int(os.environ.get("BATCH", 16))
OUT = os.environ.get("OUT", "/tmp/pcfm_gen_quality")
BUDGET_S = float(os.environ.get("BUDGET_S", 1500))
# Final sampling-hyperparameter sweep: guidance is an eval-time knob
# (reference --guidance_scale, train.py:161); sweep it on the trained
# model and report the best suite alongside the train-time setting.
SWEEP = [float(g) for g in os.environ.get(
    "GUIDANCE_SWEEP", "").split(",") if g.strip()]
# r4 recipe sweep (ROADMAP "next lever: sampling recipe"): JSON list of
# {"guidance": g?, "steps": s?, "oversample": k?} dicts — each is an
# eval-time knob triple evaluated as a seed band on the trained state.
# GUIDANCE_SWEEP entries are folded in as guidance-only recipes.
RECIPES = json.loads(os.environ.get("RECIPES", "[]"))
# in-loop early-stop thresholds (defaults = the r3 stricter-than-report
# targets; push lower for longer runs)
NNA_TARGET = float(os.environ.get("NNA_TARGET", 0.70))
COV_TARGET = float(os.environ.get("COV_TARGET", 0.45))
# final-eval protocol (r4, VERDICT weak #2/#4): repeated-seed suite evals
# reported as mean +- spread, CD and EMD variants both
FINAL_SEEDS = [int(s) for s in os.environ.get(
    "FINAL_SEEDS", "101,202,303").split(",") if s.strip()]
SWEEP_SEEDS = [int(s) for s in os.environ.get(
    "SWEEP_SEEDS", "101,202,303").split(",") if s.strip()]
# resume an interrupted run from its save_state pickle (same config knobs
# required — the flat-vector length is checked loudly)
RESUME = os.environ.get("RESUME", "")

if os.environ.get("GENQ_CPU"):     # smoke-test off-chip (the axon plugin
    jax.config.update("jax_platforms", "cpu")   # ignores JAX_PLATFORMS)
float(jnp.sum(jnp.ones((8, 8))))
print("[genq] device claimed:", jax.devices()[0], flush=True)

from pcfm.config import Config
from pcfm.data.synthetic import SyntheticDataset
from pcfm.eval.metrics import generative_metrics
from pcfm.train.evaluate import make_sample_fn
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step
from pcfm.utils import save_point_cloud_ply_rgb


def _dump_json(path, obj):
    """Atomic JSON write: a session death mid-write must not leave a
    truncated file (r4 ADVICE) — temp file in the same dir + os.replace."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def main():
    os.makedirs(OUT, exist_ok=True)
    t_all = time.time()
    ds = SyntheticDataset(split="train", size=SIZE, n_points=N,
                          tr_sample_size=N, te_sample_size=N,
                          with_rgb=True, with_cond=True, seed=0)
    ds_te = SyntheticDataset(split="test", size=TEST, n_points=N,
                             tr_sample_size=N, te_sample_size=N,
                             with_rgb=True, with_cond=True, seed=0)
    pts_all = jax.device_put(jnp.asarray(np.stack(ds.clouds)))
    rgb_all = jax.device_put(jnp.asarray(np.stack(ds.rgbs)))
    cond_all = jax.device_put(jnp.asarray(ds.thetas)[:, None])
    te_pts = np.stack(ds_te.clouds)                        # host (ref set)
    te_cond = jax.device_put(jnp.asarray(ds_te.thetas)[:, None])
    print(f"[genq] data on device: {SIZE}x{N} pts "
          f"({pts_all.nbytes / 1e6:.0f} MB), test ref {TEST}", flush=True)

    steps_per_epoch = SIZE // B
    # CTX/LATENT env knobs let the CPU smoke test shrink the model
    res = [int(x) for x in os.environ.get("CTX_RES", "32,16,8").split(",")]
    ch = [int(x) for x in os.environ.get("CTX_CH", "128,256,256").split(",")]
    blocks = [int(x) for x in os.environ.get("CTX_BLOCKS",
                                             "2,2,2").split(",")]
    cfg = Config(pf_backbone="hybrid",
                 latent_dim=int(os.environ.get("LATENT", 64)),
                 has_rgb=True,
                 # capacity knobs (r4 scaling lever, VERDICT #1): head
                 # width/depth + ctx dim alongside the CTX_* stage knobs
                 pf_width=int(os.environ.get("PF_WIDTH", 512)),
                 pf_depth=int(os.environ.get("PF_DEPTH", 6)),
                 ctx_dim=int(os.environ.get("CTX_DIM", 64)),
                 cond_dim=1, pointflow_rgb=True, use_rgb_in_latent=True,
                 amp=True, use_bf16=True, tr_max_sample_points=N,
                 batch_size=B, epochs=EPOCHS, warmup_steps=200,
                 geom_warmup_epochs=int(os.environ.get("GEOM_WARMUP", 20)),
                 cfg_drop_warmup_epochs=40,
                 ctx_stage_res=res, ctx_stage_channels=ch,
                 ctx_stage_blocks=blocks,
                 sampler="heun",
                 sample_steps=int(os.environ.get("SAMPLE_STEPS", 25)),
                 guidance_scale=float(os.environ.get("GUIDANCE", 0.0)),
                 # training-side density levers (r5, VERDICT #2): t-shape,
                 # prior std, minibatch OT coupling — all default-reference
                 t_beta_a=float(os.environ.get("T_BETA_A", 2.0)),
                 fm_coupling=os.environ.get("FM_COUPLING", "indep"),
                 point_prior_std=float(os.environ.get("PRIOR_STD", 1.0)),
                 # endpoint-EMD fine-tune lever (Config.lambda_emd): set it
                 # on a RESUME of a trained state for a short density-aware
                 # phase — lambdas leave the flat param length unchanged
                 lambda_emd=float(os.environ.get("LAMBDA_EMD", 0.0)),
                 # LR env (fine-tune phases want a flat small LR rather
                 # than the tail of the resumed cosine); scales all groups
                 lr_enc=float(os.environ.get("LR", 3e-4)),
                 lr_pf=float(os.environ.get("LR", 3e-4)),
                 lr_lf=float(os.environ.get("LR", 3e-4)),
                 use_cosine_lr=os.environ.get("COSINE", "1") != "0",
                 seed=7)
    rng = jax.random.PRNGKey(cfg.seed)
    bundle, state, tx = init_state(cfg, rng,
                                   total_steps=EPOCHS * steps_per_epoch)
    step = make_train_step(bundle, tx, donate=True)
    sample = make_sample_fn(bundle)           # latent Heun -> point Heun

    @jax.jit
    def gather_batch(idx):
        return (jnp.take(pts_all, idx, axis=0),
                jnp.take(rgb_all, idx, axis=0),
                jnp.take(cond_all, idx, axis=0))

    def run_suite(state, ep, sample_fn=None, metrics=("cd",)):
        sample_fn = sample_fn or sample
        gens = []
        for s0 in range(0, TEST, B):
            conds = te_cond[s0:s0 + B]
            pad = B - conds.shape[0]
            if pad:
                conds = jnp.concatenate(
                    [conds, jnp.zeros((pad, 1), conds.dtype)])
            x = sample_fn(state, conds, jax.random.fold_in(rng, 77_000 + ep
                                                           + s0), B, N)
            gens.append(np.asarray(x)[:B - pad, :, :3])
        gen = np.concatenate(gens)[:TEST]
        return gen, generative_metrics(gen, te_pts, metrics=metrics)

    def seed_band(state, seeds, sample_fn=None, metrics=("cd",), tag=0):
        """Repeated-seed suites -> per-metric mean / min / max (r4
        protocol: the 1-NNA run-to-run spread is the same order as the
        deltas under test, ROADMAP #20)."""
        rows = []
        for s in seeds:
            _, suite = run_suite(state, 900_000 + tag * 1000 + s,
                                 sample_fn=sample_fn, metrics=metrics)
            rows.append({k: float(v) for k, v in suite.items()})
            print(f"[genq] seed {s}: "
                  f"{ {k: round(v, 4) for k, v in rows[-1].items()} }",
                  flush=True)
        agg = {}
        for k in rows[0]:
            vals = [r[k] for r in rows]
            agg[k] = {"mean": round(float(np.mean(vals)), 4),
                      "min": round(float(np.min(vals)), 4),
                      "max": round(float(np.max(vals)), 4)}
        return rows, agg

    def save_state(state, ep=0, gstep=0):
        # survive session death: host-side pickle of the full train state.
        # ONE device->host transfer (ravel_pytree): per-leaf readbacks pay
        # a tunnel round-trip each — measured 400+ s for this state.
        from jax.flatten_util import ravel_pytree
        flat, unravel = ravel_pytree(state)
        host = np.asarray(flat)
        # atomic: a reset mid-write must not corrupt the only resume point
        path = os.path.join(OUT, "state_latest.pkl")
        with open(path + ".tmp", "wb") as f:
            pickle.dump({"flat": host, "unravel": None, "epoch": ep,
                         "gstep": gstep, "cfg": dataclasses.asdict(cfg),
                         "size": SIZE, "test": TEST, "npts": N, "batch": B,
                         "note": "rebuild via init_state + ravel_pytree "
                                 "unravel on an identically-configured "
                                 "state"}, f)
        os.replace(path + ".tmp", path)

    def load_state(state, path):
        """Resume from a save_state pickle: unravel the flat vector into
        the freshly-initialized state's structure (loud length mismatch if
        the config differs)."""
        from jax.flatten_util import ravel_pytree
        flat, unravel = ravel_pytree(state)
        with open(path, "rb") as f:
            saved = pickle.load(f)
        host = saved["flat"]
        if host.shape != flat.shape:
            raise ValueError(
                f"resume shape mismatch: saved {host.shape} vs state "
                f"{flat.shape} — config does not match the saved run")
        if "cfg" in saved:
            mine = dataclasses.asdict(cfg)
            diff = {k: (v, mine.get(k)) for k, v in saved["cfg"].items()
                    if mine.get(k) != v}
            if diff:
                print(f"[genq] WARNING resume cfg diff: {diff}", flush=True)
        return (unravel(jax.device_put(jnp.asarray(host))),
                int(saved.get("epoch", 0)), int(saved.get("gstep", 0)))

    npr = np.random.RandomState(1)
    hist = []
    t0 = time.time()
    gstep = 0
    start_ep = 1
    if RESUME:
        state, res_ep, res_gs = load_state(state, RESUME)
        # legacy pickles (pre-resume-support) carry no epoch; take it from
        # RESUME_EPOCH (e.g. len(history.json) of the interrupted run)
        start_ep = (res_ep or int(os.environ.get("RESUME_EPOCH", 0))) + 1
        gstep = res_gs or (start_ep - 1) * steps_per_epoch
        # keep the host RNG stream position consistent with a straight-
        # through run (one permutation per epoch)
        for _ in range(start_ep - 1):
            npr.permutation(SIZE)
        hist_path = os.path.join(OUT, "history.json")
        if os.path.exists(hist_path):
            hist = json.load(open(hist_path))[:start_ep - 1]
        print(f"[genq] resumed {RESUME} at epoch {start_ep} "
              f"(gstep {gstep})", flush=True)
    done = False
    ep = start_ep - 1          # loop may not run (resume of a finished run)
    last_save_ep = -1
    for ep in range(start_ep, EPOCHS + 1):
        order = npr.permutation(SIZE)[:steps_per_epoch * B]
        color_on = jnp.float32(1.0 if ep > cfg.geom_warmup_epochs else 0.0)
        dp = jnp.float32(cfg.cfg_drop_p * min(
            1.0, ep / max(1, cfg.cfg_drop_warmup_epochs)))
        lp = lz = le = 0.0
        for si in range(steps_per_epoch):
            idx = jnp.asarray(order[si * B:(si + 1) * B])
            p, r, c = gather_batch(idx)
            state, m = step(state, {"pts": p, "rgb": r, "cond": c},
                            jax.random.fold_in(rng, gstep), color_on, dp)
            gstep += 1
            if si >= steps_per_epoch - 2:
                lp += float(m["loss_point"]) / 2
                lz += float(m["loss_latent"]) / 2
                le += float(m.get("loss_emd", 0.0)) / 2
        row = {"epoch": ep, "loss_point": round(lp, 4),
               "loss_latent": round(lz, 4),
               "elapsed_s": round(time.time() - t0, 1)}
        if cfg.lambda_emd > 0:
            row["loss_emd"] = round(le, 4)
        if ep % EVAL_EVERY == 0 or ep == EPOCHS:
            gen, suite = run_suite(state, ep)
            row.update({k: round(float(v), 4) for k, v in suite.items()})
            done = (suite.get("nna_cd", 1.0) <= NNA_TARGET
                    and suite.get("cov_cd", 0.0) >= COV_TARGET)
        if ep % SAVE_EVERY == 0 or ep == EPOCHS or done:
            t_sv = time.time()
            save_state(state, ep, gstep)
            last_save_ep = ep
            print(f"[genq] state saved at ep{ep} "
                  f"({time.time() - t_sv:.0f}s)", flush=True)
        hist.append(row)
        print(f"[genq] {row}", flush=True)
        _dump_json(os.path.join(OUT, "history.json"), hist)
        if done or time.time() - t_all > BUDGET_S:
            if not done:
                print("[genq] budget out", flush=True)
            break

    # ---- final protocol (r4): repeated-seed band, CD + EMD variants ----
    if (ep >= start_ep and last_save_ep != ep
            and os.environ.get("FINAL_SAVE", "1") != "0"):
        # budget-break between saves.  (ep < start_ep means a resume of a
        # FINISHED run — eval-only re-band, e.g. a post-hoc
        # sample_steps/guidance sweep; nothing new to save, and the save
        # is a 700-1400 s state readback.  FINAL_SAVE=0 opts a short
        # probe run out of the readback entirely.)
        save_state(state, ep, gstep)
    if not FINAL_SEEDS:
        print("[genq] FINAL_SEEDS empty — skipping the final protocol",
              flush=True)
        return
    print(f"[genq] final band over seeds {FINAL_SEEDS} (cd+emd):",
          flush=True)
    final_rows, final_agg = seed_band(state, FINAL_SEEDS,
                                      metrics=("cd", "emd"), tag=0)
    print(f"[genq] final agg: {final_agg}", flush=True)
    gen, _ = run_suite(state, 900_000 + FINAL_SEEDS[0])   # PLY/npy dump
    np.save(os.path.join(OUT, "gen_final.npy"), gen)

    result = {"protocol": {"test_clouds": TEST, "seeds": FINAL_SEEDS,
                           "sampler": cfg.sampler,
                           "sample_steps": cfg.sample_steps,
                           "guidance": cfg.guidance_scale},
              "default": final_agg, "default_per_seed": final_rows}
    # write-as-you-go: each suite band is minutes of chip time, and a
    # session death between bands must not lose the completed ones
    # (run8's first attempt lost its whole sweep to a machine reset)
    _dump_json(os.path.join(OUT, "final_suite.json"), result)
    recipes = ([{"guidance": g} for g in SWEEP] + list(RECIPES))
    if recipes:
        from pcfm.train.state import ModelBundle

        def recipe_bundle(r):
            return ModelBundle(dataclasses.replace(
                cfg,
                guidance_scale=float(r.get("guidance", cfg.guidance_scale)),
                sample_steps=int(r.get("steps", cfg.sample_steps)),
                eval_oversample=float(r.get("oversample", 1.0)),
                # diversity knobs (r5, VERDICT #3): latent prior std and
                # latent-flow NFE, swept independently of the point flow
                latent_prior_std=float(r.get("latent_std",
                                             cfg.latent_prior_std)),
                latent_sample_steps=int(r.get("latent_steps", 0))))

        sweep_out = []
        if SWEEP_SEEDS == FINAL_SEEDS:
            base_mean = final_agg["nna_cd"]["mean"]
        else:
            # selection must be same-protocol: re-band the default
            # recipe over SWEEP_SEEDS (comparing a SWEEP_SEEDS mean
            # against the FINAL_SEEDS mean would let ~0.03 protocol noise
            # pick the winner)
            _, base_agg = seed_band(state, SWEEP_SEEDS, metrics=("cd",),
                                    tag=998)
            base_mean = base_agg["nna_cd"]["mean"]
        best_r, best_mean = None, base_mean
        for i, r in enumerate(recipes):
            sample_r = make_sample_fn(recipe_bundle(r))
            # cd+emd per recipe: the density recipe targets the EMD gap
            rows_r, agg_r = seed_band(state, SWEEP_SEEDS, sample_fn=sample_r,
                                      metrics=("cd", "emd"), tag=i + 1)
            sweep_out.append({"recipe": r, "agg": agg_r,
                              "per_seed": rows_r})
            print(f"[genq] sweep {r}: {agg_r}", flush=True)
            _dump_json(os.path.join(OUT, "guidance_sweep.json"),
                       sweep_out)                   # incremental
            if agg_r["nna_cd"]["mean"] < best_mean:
                best_r, best_mean = r, agg_r["nna_cd"]["mean"]
        if sweep_out:
            by_emd = min(sweep_out, key=lambda e: e["agg"]["nna_emd"]["mean"])
            result.update({"best_emd_recipe": by_emd["recipe"],
                           "best_emd_agg": by_emd["agg"]})
        if best_r is not None:
            # full cd+emd band at the winning recipe over FINAL_SEEDS
            sample_b = make_sample_fn(recipe_bundle(best_r))
            rows_b, agg_b = seed_band(state, FINAL_SEEDS,
                                      sample_fn=sample_b,
                                      metrics=("cd", "emd"), tag=999)
            result.update({"best_recipe": best_r,
                           "best_guidance": best_r.get("guidance",
                                                       cfg.guidance_scale),
                           "best": agg_b, "best_per_seed": rows_b})
            print(f"[genq] best band ({best_r}): {agg_b}", flush=True)
            gen, _ = run_suite(state, 900_000 + FINAL_SEEDS[0],
                               sample_fn=sample_b)
            np.save(os.path.join(OUT, "gen_final.npy"), gen)
    for i in range(4):
        save_point_cloud_ply_rgb(
            gen[i], np.full_like(gen[i], 0.6),
            os.path.join(OUT, f"gen_{i}.ply"))
        save_point_cloud_ply_rgb(te_pts[i], np.asarray(ds_te.rgbs[i]),
                                 os.path.join(OUT, f"ref_{i}.ply"))
    _dump_json(os.path.join(OUT, "final_suite.json"), result)
    print(f"[genq] total {time.time() - t_all:.0f}s; history + PLYs in "
          f"{OUT}", flush=True)


if __name__ == "__main__":
    main()
