"""Evaluation CLI: CD / EMD / F-score of a trained model on its test set.

Two protocols, mirroring the reference's train-time evals (train.py:283-429)
but as a standalone offline pass over the WHOLE test split:
  * recon — z = enc(GT), point-flow from prior, metrics vs. GT
  * gen   — latent-flow z samples, point-flow, metrics vs. GT batches
"""
from __future__ import annotations

import argparse
import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from pcfm.data import DataLoader, get_datasets
from pcfm.eval.metrics import aggregate, cloud_metrics
from pcfm.sample.cli import load_run
from pcfm.train.evaluate import make_recon_fn, make_sample_fn


def pad_batch(arr: Optional[jax.Array], full: int) -> Optional[jax.Array]:
    """Pad a ragged tail batch to the jit-stable full batch size by
    repeating the last row; callers slice results back to the true count."""
    if arr is None or arr.shape[0] == full:
        return arr
    pad = jnp.broadcast_to(arr[-1:], (full - arr.shape[0],) + arr.shape[1:])
    return jnp.concatenate([arr, pad], axis=0)


def main(argv: Optional[Sequence[str]] = None):
    p = argparse.ArgumentParser("pcfm evaluation")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--mode", type=str, default="both",
                   choices=["recon", "gen", "both", "suite"])
    p.add_argument("--suite_size", type=int, default=0,
                   help="suite mode: clouds per set (0 = whole test set)")
    p.add_argument("--suite_emd", action="store_true",
                   help="suite mode: also compute MMD/COV/1-NNA under EMD")
    p.add_argument("--suite_seeds", type=str, default="",
                   help="suite mode: comma-separated PRNG seeds; with >1 "
                        "the suite is resampled per seed and reported as a "
                        "per-metric mean/min/max band (the 1-NNA run-to-run "
                        "spread is ~the size of typical deltas — "
                        "ROADMAP #20); empty = single pass at --seed")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_batches", type=int, default=0,
                   help="0 = whole test set")
    p.add_argument("--sample_steps", type=int, default=None)
    p.add_argument("--latent_sample_steps", type=int, default=None,
                   help="latent-flow NFE override (0 = sample_steps)")
    p.add_argument("--sampler", type=str, default=None)
    p.add_argument("--guidance_scale", type=float, default=None)
    p.add_argument("--eval_oversample", type=float, default=None,
                   help="density recipe: sample ceil(k*N) points per cloud "
                        "and FPS-subsample to N (1.0 = off)")
    p.add_argument("--latent_prior_std", type=float, default=None,
                   help="latent prior std override (diversity knob)")
    p.add_argument("--emd_max_points", type=int, default=4096)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    over = {k: getattr(args, k) for k in
            ("data_dir", "batch_size", "sample_steps", "latent_sample_steps",
             "sampler", "guidance_scale", "eval_oversample",
             "latent_prior_std")}
    cfg, bundle, state, ep = load_run(args.out_dir, over)
    # eval_only: keep the restored run's recorded cond_dim/has_rgb
    # authoritative (the model's input widths are fixed by the restored
    # params), skip the train-split scan, and pad the test condition to
    # the run's dim — get_datasets verifies data compatibility instead
    # of mutating cfg under the built bundle
    _, te_ds = get_datasets(cfg, eval_only=True)
    # drop_last=False: the tail batch is padded to the jit batch size and the
    # padded rows' metrics sliced off, so EVERY test cloud is evaluated.
    loader = DataLoader(te_ds, cfg.batch_size, shuffle=False, drop_last=False,
                        seed=cfg.seed, num_workers=2)

    recon_fn = make_recon_fn(bundle)
    sample_fn = make_sample_fn(bundle)
    key = jax.random.PRNGKey(args.seed)

    if args.mode == "suite":
        # set-level generative metrics: sample one generated cloud per test
        # cloud (same conds) and run the MMD/COV/1-NNA protocol
        from pcfm.eval.metrics import generative_metrics
        metrics = ("cd", "emd") if args.suite_emd else ("cd",)

        def run_suite(seed: int):
            key = jax.random.PRNGKey(seed)
            refs, gens = [], []
            for bi, batch in enumerate(loader.epoch_batches(0)):
                if args.max_batches and bi >= args.max_batches:
                    break
                pts = jnp.asarray(batch["test_points"], jnp.float32)
                cond = batch.get("cond")
                cond = jnp.asarray(cond, jnp.float32) if cond is not None \
                    else None
                true_b = pts.shape[0]
                k1 = jax.random.fold_in(key, bi)
                x = sample_fn(state, pad_batch(cond, cfg.batch_size),
                              k1, cfg.batch_size, pts.shape[1])
                refs.append(np.asarray(pts))
                gens.append(np.asarray(x)[:true_b, :, :3])
                if args.suite_size and sum(r.shape[0] for r in refs) >= \
                        args.suite_size:
                    break
            ref = np.concatenate(refs)[:args.suite_size or None]
            gen = np.concatenate(gens)[:args.suite_size or None]
            return ref.shape[0], generative_metrics(gen, ref,
                                                    metrics=metrics)

        seeds = [int(s) for s in args.suite_seeds.split(",") if s.strip()]
        out = {"epoch": ep, "sampler": cfg.sampler,
               "steps": cfg.sample_steps}
        if len(seeds) <= 1:
            n_clouds, suite = run_suite(seeds[0] if seeds else args.seed)
            out.update(n_clouds=n_clouds,
                       **{k: round(v, 6) for k, v in suite.items()})
        else:
            # repeated-seed band (r4 protocol): same reference set, fresh
            # generation per seed; report mean/min/max per metric
            rows = []
            for s in seeds:
                n_clouds, suite = run_suite(s)
                rows.append({k: float(v) for k, v in suite.items()})
            out["n_clouds"] = n_clouds
            out["seeds"] = seeds
            out["per_seed"] = [{k: round(v, 6) for k, v in r.items()}
                               for r in rows]
            for k in rows[0]:
                vals = [r[k] for r in rows]
                out[k] = {"mean": round(float(np.mean(vals)), 6),
                          "min": round(float(np.min(vals)), 6),
                          "max": round(float(np.max(vals)), 6)}
        print(json.dumps(out))
        return out

    results = {}
    counts = {}
    for mode in (["recon", "gen"] if args.mode == "both" else [args.mode]):
        batches = []
        for bi, batch in enumerate(loader.epoch_batches(0)):
            if args.max_batches and bi >= args.max_batches:
                break
            pts = jnp.asarray(batch["test_points"], jnp.float32)
            rgb = batch.get("test_rgb")
            rgb = jnp.asarray(rgb, jnp.float32) if rgb is not None else None
            cond = batch.get("cond")
            cond = jnp.asarray(cond, jnp.float32) if cond is not None else None
            true_b = pts.shape[0]
            pts = pad_batch(pts, cfg.batch_size)
            rgb = pad_batch(rgb, cfg.batch_size)
            cond = pad_batch(cond, cfg.batch_size)
            key, k1 = jax.random.split(key)
            if mode == "recon":
                x = recon_fn(state, pts, rgb, cond, k1)
            else:
                x = sample_fn(state, cond, k1, pts.shape[0], pts.shape[1])
            mb = cloud_metrics(x, pts, emd_max_points=args.emd_max_points,
                               key=k1)
            batches.append({k: np.asarray(v)[:true_b]
                            for k, v in mb.items()})
        results[mode] = aggregate(batches)
        counts[mode] = sum(int(mb["cd"].shape[0]) for mb in batches)

    out = {"epoch": ep, "sampler": cfg.sampler, "steps": cfg.sample_steps,
           "n_clouds": max(counts.values()),
           **{f"{m}_{k}": round(v, 6) for m, r in results.items()
              for k, v in r.items()}}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
