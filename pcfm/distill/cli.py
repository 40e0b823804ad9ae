"""Distillation CLI: progressive few-NFE distillation of a trained run.

    python -m pcfm.distill.cli --out_dir runs/hybrid --phases 3

loads the newest checkpoint, runs `phases` teacher-halvings on the run's
training data, and saves a new checkpoint whose pf (and EMA) are the
distilled student, with ``sampler="euler"`` and the reduced
``sample_steps`` baked into its config — so the existing sample/eval CLIs
pick the fast path up transparently.
"""
from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import jax

from pcfm.data import DataLoader, get_datasets
from pcfm.distill.progressive import distill_pf
from pcfm.sample.cli import load_run
from pcfm.train import checkpoint as ckpt
from pcfm.train.loop import device_prefetch


def main(argv: Optional[Sequence[str]] = None):
    p = argparse.ArgumentParser("pcfm progressive distillation")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--save_dir", type=str, default="",
                   help="default: {out_dir}_distilled")
    p.add_argument("--phases", type=int, default=3,
                   help="number of NFE halvings")
    p.add_argument("--steps_per_phase", type=int, default=400)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--guidance_scale", type=float, default=None,
                   help="distill the CFG-guided field at this scale "
                        "(default: the run's own guidance_scale); the "
                        "saved config gets guidance_scale=0 — the student "
                        "bakes the guidance in")
    args = p.parse_args(argv)

    cfg, bundle, state, ep = load_run(args.out_dir)
    if args.batch_size:
        cfg = cfg.replace(batch_size=args.batch_size)
        bundle.cfg = cfg
    tr_ds, _ = get_datasets(cfg)
    loader = DataLoader(tr_ds, cfg.batch_size, shuffle=True, drop_last=True,
                        seed=cfg.seed + 1, num_workers=cfg.num_workers)

    def batches(phase: int):
        def raw():
            ep_i = 0
            while True:              # rewind for as long as the phase runs
                yield from loader.epoch_batches(1000 * phase + ep_i)
                ep_i += 1
        # overlap H2D with compute exactly like the train loop
        # (pcfm/train/loop.py device_prefetch; the dev-tunnel link is
        # ~10 MB/s, a synchronous per-step put would dominate wall-clock)
        yield from device_prefetch(raw(), None, cfg)

    gscale = (cfg.guidance_scale if args.guidance_scale is None
              else args.guidance_scale)
    # an UNGUIDED distillation of a CFG-trained run keeps the run's
    # guidance_scale for sampling (see new_cfg below) — so the student's
    # unconditional branch must stay supervised via cond dropout, or
    # sample-time CFG would pair v_c with an unsupervised v_u
    drop_p = (cfg.cfg_drop_p if (gscale == 0 and cfg.guidance_scale > 0)
              else 0.0)
    pf_params, pf_ema, steps = distill_pf(
        bundle, state, batches, base_steps=cfg.sample_steps,
        phases=args.phases, steps_per_phase=args.steps_per_phase,
        lr=args.lr, ema_decay=args.ema_decay,
        rng=jax.random.PRNGKey(args.seed), guidance_scale=gscale,
        cond_drop_p=drop_p)

    new_params = dict(state.params)
    new_params["pf"] = pf_params
    # the student was distilled against the EMA teacher's batch_stats
    # (distill_pf use_ema_teacher=True) — pair the live student with those
    # same stats so --no_ema_eval doesn't mix it with stale live BN stats
    new_bs = dict(state.batch_stats)
    new_bs["pf"] = state.ema_pf["batch_stats"]
    new_state = state.replace(
        params=new_params, batch_stats=new_bs,
        ema_pf={"params": pf_ema,
                "batch_stats": state.ema_pf["batch_stats"]})
    # when guidance was baked into the student (gscale > 0), zero the config
    # scale so the sample/eval CLIs don't apply CFG a second time; an
    # unguided distillation (explicit --guidance_scale 0 on a guided run)
    # keeps the run's own scale for sampling
    new_cfg = cfg.replace(sampler="euler", sample_steps=steps,
                          guidance_scale=(0.0 if gscale > 0
                                          else cfg.guidance_scale))
    save_dir = args.save_dir or (args.out_dir.rstrip("/") + "_distilled")
    os.makedirs(save_dir, exist_ok=True)
    ckpt.save(save_dir, ep, new_state, new_cfg, async_save=False)
    # actual reduction (steps clamp at 1, so 2**phases can overstate it);
    # evals/step by sampler: euler/midpoint 1, heun 2, rk4 4
    # (integrators.py docstring)
    teacher_evals = {"heun": 2, "rk4": 4}.get(cfg.sampler, 1) \
        * cfg.sample_steps
    factor = max(1, teacher_evals // max(1, steps))
    print(f"[distill] saved distilled checkpoint (euler x{steps}, "
          f"{factor}x fewer NFE) to {save_dir}")
    return save_dir, steps


if __name__ == "__main__":
    main()
