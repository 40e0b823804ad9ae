"""Sampling CLI: generate point clouds from a trained checkpoint.

Loads the newest ``hybrid_ep*`` checkpoint under --out_dir (config comes
from its meta.json sidecar, overridable from the command line), runs the
latent-flow -> point-flow pipeline fully jitted, and writes PLY files.
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Sequence

import jax
import numpy as np

from pcfm.config import Config
from pcfm.train import checkpoint as ckpt
from pcfm.train.evaluate import make_sample_fn
from pcfm.train.state import init_state
from pcfm.utils import save_point_cloud_ply, save_point_cloud_ply_rgb


def load_run(out_dir: str, overrides: Optional[dict] = None):
    """Rebuild (cfg, bundle, state) from the newest checkpoint."""
    path, ep = ckpt.find_latest(out_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoint under {out_dir}/ckpts")
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    cfg = Config.from_json(json.dumps(meta["config"]))
    for k, v in (overrides or {}).items():
        if v is not None:
            cfg = cfg.replace(**{k: v})
    bundle, state, _ = init_state(cfg, jax.random.PRNGKey(0), total_steps=1)
    state, _ = ckpt.restore(path, state)
    return cfg, bundle, state, ep


def main(argv: Optional[Sequence[str]] = None):
    p = argparse.ArgumentParser("pcfm sampling")
    p.add_argument("--out_dir", type=str, required=True,
                   help="training run dir containing ckpts/")
    p.add_argument("--save_dir", type=str, default="",
                   help="default: {out_dir}/generated")
    p.add_argument("--num_samples", type=int, default=8)
    p.add_argument("--n_points", type=int, default=2048)
    p.add_argument("--sample_steps", type=int, default=None)
    p.add_argument("--latent_sample_steps", type=int, default=None,
                   help="latent-flow NFE override (0 = sample_steps)")
    p.add_argument("--sampler", type=str, default=None,
                   choices=["euler", "midpoint", "heun", "rk4", "dopri5"])
    p.add_argument("--guidance_scale", type=float, default=None)
    p.add_argument("--eval_oversample", type=float, default=None,
                   help="density recipe: sample ceil(k*N) points per cloud "
                        "and FPS-subsample to N (1.0 = off)")
    p.add_argument("--latent_prior_std", type=float, default=None,
                   help="latent prior std override (diversity knob)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cond", type=float, nargs="*", default=None,
                   help="joint condition values (broadcast to all samples)")
    args = p.parse_args(argv)

    over = {k: getattr(args, k) for k in
            ("sample_steps", "latent_sample_steps", "sampler",
             "guidance_scale", "eval_oversample", "latent_prior_std")}
    cfg, bundle, state, ep = load_run(args.out_dir, over)
    sample_fn = make_sample_fn(bundle)

    cond = None
    if args.cond is not None and cfg.cond_dim > 0:
        c = np.zeros((args.num_samples, cfg.cond_dim), np.float32)
        c[:, :len(args.cond)] = np.asarray(args.cond, np.float32)
        cond = jax.numpy.asarray(c)

    key = jax.random.PRNGKey(args.seed)
    x = np.asarray(sample_fn(state, cond, key, args.num_samples,
                             args.n_points))

    save_dir = args.save_dir or os.path.join(args.out_dir, "generated")
    os.makedirs(save_dir, exist_ok=True)
    for i in range(x.shape[0]):
        if x.shape[-1] == 6:
            save_point_cloud_ply_rgb(x[i, :, :3], np.clip(x[i, :, 3:], 0, 1),
                                     os.path.join(save_dir,
                                                  f"sample_{i}.ply"))
        else:
            save_point_cloud_ply(x[i], os.path.join(save_dir,
                                                    f"sample_{i}.ply"))
    print(f"[sample] wrote {x.shape[0]} clouds ({x.shape[1]} pts, "
          f"ep{ep} ckpt, {cfg.sampler} x{cfg.sample_steps}) -> {save_dir}")


if __name__ == "__main__":
    main()
