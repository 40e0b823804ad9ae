"""Torch mirrors of the reference architectures (test oracles).

These re-state the reference models.py architectures in plain torch (CPU)
so the flax models can be checked for EXACT forward parity under weight
transplant.  They are test fixtures written from the documented semantics —
the reference itself cannot run here (importing its modules JIT-compiles
CUDA extensions).
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn


def timestep_embedding_t(t: torch.Tensor, dim: int,
                         max_period: float = 10000.0) -> torch.Tensor:
    half = dim // 2
    freqs = torch.exp(-math.log(max_period)
                      * torch.arange(0, half, dtype=t.dtype) / half)
    args = t.reshape(*t.shape, 1) * freqs
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class FiLMBlockT(nn.Module):
    def __init__(self, width: int, emb_dim: int):
        super().__init__()
        self.norm = nn.LayerNorm(width)
        self.affine = nn.Linear(emb_dim, width * 2)

    def forward(self, h, emb):
        h = self.norm(h)
        gamma, beta = self.affine(emb).chunk(2, dim=-1)
        return h * (1.0 + gamma) + beta


class VelocityNetT(nn.Module):
    """Mirror of reference VelocityNet (models.py:82-153)."""

    def __init__(self, cond_dim, width=512, depth=6, emb_dim=256,
                 point_dim=3):
        super().__init__()
        self.cond_dim, self.emb_dim, self.point_dim = cond_dim, emb_dim, \
            point_dim
        self.t_proj = nn.Linear(emb_dim, emb_dim)
        self.c_proj = nn.Linear(cond_dim if cond_dim > 0 else 1, emb_dim)
        self.input = nn.Linear(point_dim + emb_dim, width)
        self.blocks = nn.ModuleList(
            [nn.Sequential(nn.SiLU(), nn.Linear(width, width))
             for _ in range(depth - 1)])
        self.films = nn.ModuleList(
            [FiLMBlockT(width, emb_dim) for _ in range(depth - 1)])
        self.out = nn.Sequential(nn.SiLU(), nn.Linear(width, point_dim))

    def forward(self, x, t, cond, cond_drop_mask=None):
        b, n, _ = x.shape
        t_emb = torch.nn.functional.silu(
            self.t_proj(timestep_embedding_t(t, self.emb_dim)))
        if self.cond_dim > 0 and cond is not None:
            if cond_drop_mask is not None:
                cond = cond * (1.0 - cond_drop_mask)
            c_in = cond
        else:
            c_in = x.new_zeros((b, self.cond_dim if self.cond_dim > 0
                                else 1))
        c_emb = torch.nn.functional.silu(self.c_proj(c_in))
        emb = t_emb + c_emb
        emb_bn = emb[:, None, :].expand(b, n, -1).reshape(b * n, -1)
        h = torch.cat([x, emb[:, None, :].expand(b, n, -1)],
                      dim=-1).reshape(b * n, -1)
        h = self.input(h)
        for blk, fim in zip(self.blocks, self.films):
            h = fim(h, emb_bn)
            h = h + blk(h)
        return self.out(h).reshape(b, n, self.point_dim)


class ShapeEncoderT(nn.Module):
    """Mirror of reference ShapeEncoder (models.py:156-187)."""

    def __init__(self, latent_dim=256, width=128, depth=4, in_channels=3):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(in_channels, width), nn.SiLU(),
            nn.Linear(width, width), nn.SiLU(),
            nn.Linear(width, width), nn.SiLU())
        heads = []
        in_d = width
        for _ in range(max(1, depth - 3)):
            heads += [nn.Linear(in_d, width), nn.SiLU()]
            in_d = width
        heads += [nn.Linear(in_d, latent_dim)]
        self.head = nn.Sequential(*heads)

    def forward(self, pts):
        h = self.mlp(pts)
        g = h.max(dim=1).values
        return self.head(g), h


class LatentVelocityNetT(nn.Module):
    """Mirror of reference ConditionalLatentVelocityNet
    (models.py:224-275)."""

    def __init__(self, latent_dim, cond_dim=0, width=512, depth=6,
                 emb_dim=256):
        super().__init__()
        self.cond_dim, self.emb_dim = cond_dim, emb_dim
        self.t_proj = nn.Linear(emb_dim, emb_dim)
        self.c_proj = nn.Linear(cond_dim if cond_dim > 0 else 1, emb_dim)
        self.input = nn.Linear(latent_dim + emb_dim, width)
        self.blocks = nn.ModuleList(
            [nn.Sequential(nn.SiLU(), nn.Linear(width, width))
             for _ in range(depth - 1)])
        self.out = nn.Sequential(nn.SiLU(), nn.Linear(width, latent_dim))

    def forward(self, y, t, cond=None):
        t_emb = torch.nn.functional.silu(
            self.t_proj(timestep_embedding_t(t, self.emb_dim)))
        c_in = y.new_zeros((y.shape[0], self.cond_dim if self.cond_dim > 0
                            else 1)) if cond is None else cond
        c_emb = torch.nn.functional.silu(self.c_proj(c_in))
        emb = t_emb + c_emb
        h = self.input(torch.cat([y, emb], dim=-1))
        for blk in self.blocks:
            h = h + blk(h)
        return self.out(h)


# ---------------- weight transplant helpers ----------------

def lin(t_linear: nn.Linear):
    """torch Linear -> flax Dense param dict."""
    return {"kernel": np.asarray(t_linear.weight.detach().numpy().T),
            "bias": np.asarray(t_linear.bias.detach().numpy())}


def velocity_net_params(tm: VelocityNetT, depth: int):
    p = {"t_proj": lin(tm.t_proj), "c_proj": lin(tm.c_proj),
         "input": lin(tm.input), "out": lin(tm.out[1])}
    for i in range(depth - 1):
        p[f"block_{i}"] = lin(tm.blocks[i][1])
        p[f"film_{i}"] = {
            "norm": {"scale": np.asarray(tm.films[i].norm.weight.detach()
                                         .numpy()),
                     "bias": np.asarray(tm.films[i].norm.bias.detach()
                                        .numpy())},
            "affine": lin(tm.films[i].affine)}
    return p


def shape_encoder_params(tm: ShapeEncoderT, depth: int):
    p = {}
    for i in range(3):
        p[f"mlp_{i}"] = lin(tm.mlp[2 * i])
    heads = [m for m in tm.head if isinstance(m, nn.Linear)]
    for i in range(max(1, depth - 3)):
        p[f"head_{i}"] = lin(heads[i])
    p["head_out"] = lin(heads[-1])
    return p


def latent_net_params(tm: LatentVelocityNetT, depth: int):
    p = {"t_proj": lin(tm.t_proj), "c_proj": lin(tm.c_proj),
         "input": lin(tm.input), "out": lin(tm.out[1])}
    for i in range(depth - 1):
        p[f"block_{i}"] = lin(tm.blocks[i][1])
    return p
