#!/usr/bin/env python
"""Training-DYNAMICS parity: reference recipe (torch mirrors, CPU) vs pcfm.

Both frameworks train the same architecture on IDENTICAL batches (same
pcfm DataLoader, same seed) with the reference hyperparameters
(/root/reference/train.py:583-673: AdamW 3 groups, wd 1e-4, cosine LR +
warmup, Beta(2,1) t, grad clip 1.0, EMA 0.999), then reconstruct the test
split with a 16-step euler sampler from the EMA weights.  RNG draws differ
(torch vs jax engines), so the gate is statistical: late-training losses
and recon CD must agree within tolerance.

Writes docs/dyn_parity.json; run small via tests/test_dyn_parity.py.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


CTX_KW = dict(emb_dim=32, ctx_dim=8, stage_channels=(16, 16),
              stage_blocks=(1, 1), stage_res=(8, 4), with_se=True,
              gn_groups=4, with_global=True, t_gate_k=10.0, t_gate_tau=0.8)


def run(epochs=80, size=64, n_points=256, batch=8, latent=32, enc_width=32,
        pf_width=64, lf_width=64, emb=32, seed=3, sample_steps=16,
        out_json=None, verbose=True, backbone="mlp"):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from pcfm.config import Config
    from pcfm.data.loader import DataLoader
    from pcfm.data.synthetic import SyntheticDataset
    from tests.oracles import chamfer_np
    from tests.torch_mirror_train import run_torch_training

    ds = SyntheticDataset(split="train", size=size, n_points=max(512,
                                                                 n_points),
                          tr_sample_size=n_points, te_sample_size=n_points,
                          with_rgb=False, with_cond=True, seed=0)
    loader = DataLoader(ds, batch, shuffle=True, drop_last=True, seed=seed,
                        num_workers=0)

    # ---------- torch (reference recipe) ----------
    t0 = time.time()
    ctx_kw = dict(CTX_KW, emb_dim=emb) if backbone == "hybrid" else None
    tr = run_torch_training(loader, epochs, latent_dim=latent,
                            enc_width=enc_width, pf_width=pf_width,
                            pf_emb=emb, lf_width=lf_width, lf_emb=emb,
                            cond_dim=1, warmup=20,
                            sample_steps=sample_steps, seed=seed,
                            backbone=backbone, ctx_kw=ctx_kw)
    d1t, d2t, _, _ = chamfer_np(tr["pred"], tr["gt"])
    cd_torch = float(d1t.mean() + d2t.mean())
    t_torch = time.time() - t0
    if verbose:
        print(f"[torch] {epochs} ep in {t_torch:.0f}s  "
              f"lp_last={np.mean(tr['loss_point'][-5:]):.4f} "
              f"ll_last={np.mean(tr['loss_latent'][-5:]):.4f} "
              f"recon_cd={cd_torch:.4f}", flush=True)

    # ---------- pcfm (same data, same recipe) ----------
    import jax.numpy as jnp

    from pcfm.train.loop import train
    from pcfm.train.state import init_state
    from pcfm.train.step import make_train_step
    from pcfm.train.evaluate import make_recon_fn
    from pcfm.train.state import ModelBundle

    hybrid_cfg = {}
    if backbone == "hybrid":
        hybrid_cfg = dict(ctx_dim=CTX_KW["ctx_dim"], ctx_emb_dim=emb,
                          ctx_stage_channels=list(CTX_KW["stage_channels"]),
                          ctx_stage_blocks=list(CTX_KW["stage_blocks"]),
                          ctx_stage_res=list(CTX_KW["stage_res"]),
                          ctx_with_se=True, ctx_norm="group",
                          ctx_gn_groups=CTX_KW["gn_groups"],
                          ctx_with_global=True,
                          ctx_t_gate_k=CTX_KW["t_gate_k"],
                          ctx_t_gate_tau=CTX_KW["t_gate_tau"],
                          ctx_dtype="fp32", voxel_backend="xla")
    cfg = Config(dataset_type="synthetic", pf_backbone=backbone,
                 latent_dim=latent, enc_width=enc_width, enc_depth=4,
                 pf_width=pf_width, pf_depth=3, pf_emb_dim=emb,
                 lf_width=lf_width, lf_depth=3, lf_emb_dim=emb,
                 warmup_steps=20, amp=False, epochs=epochs,
                 batch_size=batch, cfg_drop_p=0.0, geom_warmup_epochs=0,
                 pointflow_rgb=False, use_rgb_in_latent=False,
                 has_rgb=False, cond_dim=1, seed=seed,
                 sampler="euler", sample_steps=sample_steps, t_beta_a=2.0,
                 **hybrid_cfg)

    t0 = time.time()
    rng = jax.random.PRNGKey(seed)
    bundle, state, tx = init_state(cfg, rng, epochs * len(loader))
    step_fn = make_train_step(bundle, tx, donate=False)
    lp_curve, ll_curve = [], []
    gkey = jax.random.PRNGKey(seed + 17)
    for ep in range(1, epochs + 1):
        lp = ll = 0.0
        nb = 0
        for b in loader.epoch_batches(ep):
            bt = {"pts": jnp.asarray(b["train_points"], jnp.float32),
                  "cond": jnp.asarray(b["cond"], jnp.float32)}
            gkey, k = jax.random.split(gkey)
            state, m = step_fn(state, bt, k, jnp.float32(0.0),
                               jnp.float32(0.0))
            lp += float(m["loss_point"])
            ll += float(m["loss_latent"])
            nb += 1
        lp_curve.append(lp / nb)
        ll_curve.append(ll / nb)

    recon = make_recon_fn(bundle, use_ema=True)
    preds, gts, z_sq = [], [], []
    for b in loader.epoch_batches(0):
        pts = jnp.asarray(b["test_points"], jnp.float32)
        cond = jnp.asarray(b["cond"], jnp.float32)
        z, _, _ = bundle.apply_enc(state.params["enc"],
                                   state.batch_stats["enc"], pts,
                                   train=False)
        z_sq.append(float(jnp.mean(z ** 2)))
        x = recon(state, pts, None, cond, jax.random.PRNGKey(seed + 1))
        preds.append(np.asarray(x))
        gts.append(np.asarray(pts))
    pred = np.concatenate(preds, 0)
    gt = np.concatenate(gts, 0)
    d1p, d2p, _, _ = chamfer_np(pred, gt)
    cd_pcfm = float(d1p.mean() + d2p.mean())
    t_pcfm = time.time() - t0
    if verbose:
        print(f"[pcfm ] {epochs} ep in {t_pcfm:.0f}s  "
              f"lp_last={np.mean(lp_curve[-5:]):.4f} "
              f"ll_last={np.mean(ll_curve[-5:]):.4f} "
              f"recon_cd={cd_pcfm:.4f}", flush=True)

    out = {
        "config": {"epochs": epochs, "size": size, "n_points": n_points,
                   "batch": batch, "latent": latent, "pf_width": pf_width,
                   "seed": seed, "sample_steps": sample_steps},
        "torch": {"loss_point": tr["loss_point"],
                  "loss_latent": tr["loss_latent"],
                  "lp_last5": float(np.mean(tr["loss_point"][-5:])),
                  "ll_last5": float(np.mean(tr["loss_latent"][-5:])),
                  "z_rms": tr.get("z_rms"),
                  "recon_cd": cd_torch, "seconds": round(t_torch, 1)},
        "pcfm": {"loss_point": lp_curve, "loss_latent": ll_curve,
                 "lp_last5": float(np.mean(lp_curve[-5:])),
                 "ll_last5": float(np.mean(ll_curve[-5:])),
                 "z_rms": float(np.sqrt(np.mean(z_sq))),
                 "recon_cd": cd_pcfm, "seconds": round(t_pcfm, 1)},
    }
    for k in ("lp_last5", "ll_last5", "recon_cd"):
        a, b = out["torch"][k], out["pcfm"][k]
        out[f"rel_diff_{k}"] = round(abs(a - b) / max(abs(a), abs(b), 1e-9),
                                     4)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f, indent=2)
    if verbose:
        print({k: v for k, v in out.items() if k.startswith("rel_diff")},
              flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--n_points", type=int, default=256)
    ap.add_argument("--out_json", type=str, default="docs/dyn_parity.json")
    ap.add_argument("--backbone", type=str, default="mlp",
                    choices=["mlp", "hybrid"])
    a = ap.parse_args()
    run(epochs=a.epochs, size=a.size, n_points=a.n_points,
        out_json=a.out_json, backbone=a.backbone)
