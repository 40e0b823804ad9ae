"""Torch-mirror TRAINING loop — the reference recipe on CPU.

Restates the reference train step (/root/reference/train.py:583-673) with
the already-parity-proven torch mirrors (tests/torch_mirror.py): AdamW with
three param groups (enc/pf/lf, train.py:249-253), cosine LR with warmup,
Beta(a,1)-skewed t, the FM interpolant, grad-clip 1.0 and EMA 0.999 — the
3-D (geometry-only) path.  Used by the training-DYNAMICS parity harness
(scripts/dyn_parity.py + tests/test_dyn_parity.py): both frameworks train
on identical batches from the same pcfm DataLoader, and their loss curves
and recon CD are compared statistically.
"""
from __future__ import annotations

import math
from typing import Dict, List

import numpy as np
import torch

from tests.torch_mirror import (LatentVelocityNetT, ShapeEncoderT,
                                VelocityNetT)


def cosine_lr_t(step: int, total: int, base_lr: float,
                min_lr: float = 1e-6, warmup: int = 0) -> float:
    """Reference cosine_lr (train.py:255-262)."""
    if warmup > 0 and step < warmup:
        return base_lr * (step + 1) / warmup
    p = (step - warmup) / max(1, total - warmup)
    p = min(max(p, 0.0), 1.0)
    return min_lr + 0.5 * (base_lr - min_lr) * (1 + math.cos(math.pi * p))


def reference_init_(enc: ShapeEncoderT, pf: VelocityNetT,
                    lf: LatentVelocityNetT) -> None:
    """Apply the reference's explicit inits (models.py:99-116, 178-181,
    239-254): kaiming_normal(relu)+zero-bias on all trunk Linears,
    normal(0.02) t/c projections, zero FiLM affine bias, zero out bias."""
    for m in list(enc.mlp) + list(enc.head):
        if isinstance(m, torch.nn.Linear):
            torch.nn.init.kaiming_normal_(m.weight, nonlinearity="relu")
            torch.nn.init.zeros_(m.bias)
    for net in (pf, lf):
        torch.nn.init.normal_(net.t_proj.weight, std=0.02)
        torch.nn.init.zeros_(net.t_proj.bias)
        torch.nn.init.normal_(net.c_proj.weight, std=0.02)
        torch.nn.init.zeros_(net.c_proj.bias)
        torch.nn.init.kaiming_normal_(net.input.weight, nonlinearity="relu")
        torch.nn.init.zeros_(net.input.bias)
        for blk in net.blocks:
            for l in blk:
                if isinstance(l, torch.nn.Linear):
                    torch.nn.init.kaiming_normal_(l.weight,
                                                  nonlinearity="relu")
                    torch.nn.init.zeros_(l.bias)
        for l in net.out:
            if isinstance(l, torch.nn.Linear):
                torch.nn.init.zeros_(l.bias)
    for film in pf.films:
        torch.nn.init.zeros_(film.affine.bias)


def reference_init_hybrid_(pf) -> None:
    """Reference inits for HybridMLPT (models.py:392-601): zero-init
    ContextNet output head + FiLM1d affines (identity start), normal(0.02)
    t/c projections, kaiming+zero-bias on the head trunk, zero FiLM
    affine bias in the head."""
    ctx, head = pf.ctx_net, pf.head
    for net in (ctx, head):
        torch.nn.init.normal_(net.t_proj.weight, std=0.02)
        torch.nn.init.zeros_(net.t_proj.bias)
        torch.nn.init.normal_(net.c_proj.weight, std=0.02)
        torch.nn.init.zeros_(net.c_proj.bias)
    torch.nn.init.zeros_(ctx.head_out.weight)
    torch.nn.init.zeros_(ctx.head_out.bias)
    for blocks in ctx.stage_blocks:
        for blk in blocks:
            torch.nn.init.zeros_(blk.film.affine.weight)
            torch.nn.init.zeros_(blk.film.affine.bias)
    torch.nn.init.kaiming_normal_(head.input.weight, nonlinearity="relu")
    torch.nn.init.zeros_(head.input.bias)
    for blk in head.blocks:
        for l in blk:
            if isinstance(l, torch.nn.Linear):
                torch.nn.init.kaiming_normal_(l.weight,
                                              nonlinearity="relu")
                torch.nn.init.zeros_(l.bias)
    for l in head.out:
        if isinstance(l, torch.nn.Linear):
            torch.nn.init.zeros_(l.bias)
    for film in head.films:
        torch.nn.init.zeros_(film.affine.bias)


class EmaT:
    """Reference EMA shadow (train.py:212-231)."""

    def __init__(self, model: torch.nn.Module, decay: float = 0.999):
        self.decay = decay
        self.shadow = {k: v.detach().clone()
                       for k, v in model.state_dict().items()
                       if v.dtype.is_floating_point}

    def update(self, model: torch.nn.Module):
        for k, v in model.state_dict().items():
            if k in self.shadow:
                self.shadow[k].mul_(self.decay).add_(v.detach(),
                                                     alpha=1 - self.decay)

    def copy_to(self, model: torch.nn.Module):
        sd = model.state_dict()
        for k, v in self.shadow.items():
            sd[k].copy_(v)


def run_torch_training(loader, epochs: int, latent_dim: int = 32,
                       enc_width: int = 32, enc_depth: int = 4,
                       pf_width: int = 64, pf_depth: int = 3,
                       pf_emb: int = 32, lf_width: int = 64,
                       lf_depth: int = 3, lf_emb: int = 32,
                       cond_dim: int = 1, lr: float = 3e-4,
                       warmup: int = 20, t_beta_a: float = 2.0,
                       grad_clip: float = 1.0, ema_decay: float = 0.999,
                       sample_steps: int = 16, seed: int = 0,
                       backbone: str = "mlp",
                       ctx_kw: Dict = None) -> Dict:
    """Train the mirrors with the reference recipe; returns loss curves and
    the EMA euler recon CD on the training data's test split."""
    torch.manual_seed(seed)
    enc = ShapeEncoderT(latent_dim, enc_width, enc_depth, 3)
    if backbone == "hybrid":
        from tests.torch_mirror_hybrid import HybridMLPT
        ctx_kw = dict(ctx_kw or {})
        head_kw = dict(ctx_dim=ctx_kw.get("ctx_dim", 8), width=pf_width,
                       depth=pf_depth, emb_dim=pf_emb)
        pf = HybridMLPT(latent_dim + cond_dim, 3, ctx_kw, head_kw)
    else:
        pf = VelocityNetT(latent_dim + cond_dim, pf_width, pf_depth,
                          pf_emb, 3)
    lf = LatentVelocityNetT(latent_dim, 0, lf_width, lf_depth, lf_emb)
    if backbone == "hybrid":
        for m in list(enc.mlp) + list(enc.head):
            if isinstance(m, torch.nn.Linear):
                torch.nn.init.kaiming_normal_(m.weight,
                                              nonlinearity="relu")
                torch.nn.init.zeros_(m.bias)
        reference_init_hybrid_(pf)
        for net in (lf,):
            torch.nn.init.normal_(net.t_proj.weight, std=0.02)
            torch.nn.init.zeros_(net.t_proj.bias)
            torch.nn.init.normal_(net.c_proj.weight, std=0.02)
            torch.nn.init.zeros_(net.c_proj.bias)
            torch.nn.init.kaiming_normal_(net.input.weight,
                                          nonlinearity="relu")
            torch.nn.init.zeros_(net.input.bias)
            for blk in net.blocks:
                for l in blk:
                    if isinstance(l, torch.nn.Linear):
                        torch.nn.init.kaiming_normal_(
                            l.weight, nonlinearity="relu")
                        torch.nn.init.zeros_(l.bias)
            for l in net.out:
                if isinstance(l, torch.nn.Linear):
                    torch.nn.init.zeros_(l.bias)
    else:
        reference_init_(enc, pf, lf)
    opt = torch.optim.AdamW([
        {"params": enc.parameters(), "lr": lr},
        {"params": pf.parameters(), "lr": lr},
        {"params": lf.parameters(), "lr": lr},
    ], weight_decay=1e-4)
    ema_pf, ema_lf = EmaT(pf, ema_decay), EmaT(lf, ema_decay)

    steps_per_epoch = len(loader)
    total_steps = epochs * steps_per_epoch
    beta = torch.distributions.Beta(t_beta_a, 1.0)
    gstep = 0
    lp_curve: List[float] = []
    ll_curve: List[float] = []

    for ep in range(1, epochs + 1):
        lp = ll = 0.0
        nb = 0
        for batch in loader.epoch_batches(ep):
            pts = torch.from_numpy(batch["train_points"]).float()
            cond_j = torch.from_numpy(batch["cond"]).float() \
                if "cond" in batch else None
            b = pts.shape[0]

            z, _ = enc(pts)
            z_pts = torch.randn_like(pts)
            t_pts = beta.sample((b,)).float()
            x_t = (1 - t_pts)[:, None, None] * z_pts \
                + t_pts[:, None, None] * pts
            target_v = pts - z_pts
            cond_full = z if cond_j is None else torch.cat([z, cond_j], 1)
            pred = pf(x_t, t_pts, cond_full)
            loss_point = torch.nn.functional.mse_loss(pred, target_v)

            z_det = z.detach()
            eps_z = torch.randn_like(z_det)
            t_z = beta.sample((b,)).float()
            y_t = (1 - t_z)[:, None] * eps_z + t_z[:, None] * z_det
            pred_z = lf(y_t, t_z, cond=None)
            loss_latent = torch.nn.functional.mse_loss(pred_z,
                                                       z_det - eps_z)
            loss = loss_point + loss_latent
            loss.backward()
            torch.nn.utils.clip_grad_norm_(
                list(enc.parameters()) + list(pf.parameters())
                + list(lf.parameters()), grad_clip)
            opt.step()
            opt.zero_grad(set_to_none=True)
            ema_pf.update(pf)
            ema_lf.update(lf)
            for g in opt.param_groups:
                g["lr"] = cosine_lr_t(gstep, total_steps, lr, 1e-6, warmup)
            gstep += 1
            lp += float(loss_point.detach())
            ll += float(loss_latent.detach())
            nb += 1
        lp_curve.append(lp / max(1, nb))
        ll_curve.append(ll / max(1, nb))

    # ---- EMA euler recon on the test split (train.py:283-341) ----
    ema_pf.copy_to(pf)
    pf.eval()
    enc.eval()
    preds, gts = [], []
    z_sq = []                    # diagnosing the latent-loss scale: the
    # latent FM loss tracks E||z||^2 (its target is z - eps)
    with torch.no_grad():
        for batch in loader.epoch_batches(0):
            gt = torch.from_numpy(batch["test_points"]).float()
            cond_j = torch.from_numpy(batch["cond"]).float() \
                if "cond" in batch else None
            z, _ = enc(gt)
            z_sq.append(float((z ** 2).mean()))
            cond_full = z if cond_j is None else torch.cat([z, cond_j], 1)
            torch.manual_seed(seed + 1)
            x = torch.randn_like(gt)
            dt = 1.0 / sample_steps
            for k in range(sample_steps):
                t = torch.full((gt.shape[0],), k * dt)
                x = x + dt * pf(x, t, cond_full)
            preds.append(x.numpy())
            gts.append(gt.numpy())
    return {"loss_point": lp_curve, "loss_latent": ll_curve,
            "pred": np.concatenate(preds, 0),
            "gt": np.concatenate(gts, 0),
            "z_rms": float(np.sqrt(np.mean(z_sq)))}
