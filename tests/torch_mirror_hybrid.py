"""Torch mirror of the reference hybrid stack (PVConv / ContextNet /
HybridMLP) with pure-torch voxel ops, plus torch->flax weight transplant.

Pure-torch scatter-mean and trilinear gather replace the reference CUDA
kernels so the mirror runs on CPU; semantics follow
modules/voxelization.py:16-25, vox.cu, trilinear_devox.cu and
models.py:322-694.  Comparisons run in eval mode (BN running stats at
init: mean 0, var 1 — identical in torch and flax).
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_mirror import timestep_embedding_t, lin


# ---------------- pure-torch voxel ops ----------------

def normalize_coords_t(coords, r, eps=1e-6):
    coords = coords.detach()
    centered = coords - coords.mean(1, keepdim=True)
    norm = centered.norm(dim=-1, keepdim=True)
    denom = norm.max(dim=1, keepdim=True).values * 2.0 + eps
    nc = centered / denom + 0.5
    nc = torch.clamp(nc * r, 0, r - 1)
    return nc, torch.round(nc).to(torch.int64)


def avg_voxelize_t(features, vox_coords, r):
    """(B,N,C),(B,N,3) -> (B,r,r,r,C) scatter mean."""
    b, n, c = features.shape
    flat = ((vox_coords[..., 0] * r + vox_coords[..., 1]) * r
            + vox_coords[..., 2])                               # (B,N)
    out = features.new_zeros((b, r * r * r, c))
    cnt = features.new_zeros((b, r * r * r, 1))
    out.scatter_add_(1, flat[..., None].expand(-1, -1, c), features)
    cnt.scatter_add_(1, flat[..., None], torch.ones_like(flat[..., None],
                                                         dtype=features.dtype))
    out = out / cnt.clamp(min=1.0)
    return out.reshape(b, r, r, r, c)


def trilinear_devox_t(grid, norm_coords, r):
    """(B,r,r,r,C),(B,N,3) -> (B,N,C) with the frac==0 hi-collapse."""
    b = grid.shape[0]
    c = grid.shape[-1]
    flat = grid.reshape(b, r * r * r, c)
    lo_f = torch.floor(norm_coords)
    frac = norm_coords - lo_f
    lo = lo_f.to(torch.int64)
    hi = lo + (frac > 0).to(torch.int64)
    out = torch.zeros((b, norm_coords.shape[1], c), dtype=grid.dtype)
    for sx in (0, 1):
        for sy in (0, 1):
            for sz in (0, 1):
                x = hi[..., 0] if sx else lo[..., 0]
                y = hi[..., 1] if sy else lo[..., 1]
                z = hi[..., 2] if sz else lo[..., 2]
                idx = (x * r + y) * r + z
                wx = frac[..., 0] if sx else 1 - frac[..., 0]
                wy = frac[..., 1] if sy else 1 - frac[..., 1]
                wz = frac[..., 2] if sz else 1 - frac[..., 2]
                w = (wx * wy * wz)[..., None]
                g = torch.gather(flat, 1, idx[..., None].expand(-1, -1, c))
                out = out + w * g
    return out


# ---------------- building blocks (channel-last like pcfm) ----------------

class SharedMLPT(nn.Module):
    def __init__(self, in_c, out_channels):
        super().__init__()
        ocs = out_channels if isinstance(out_channels, (list, tuple)) \
            else [out_channels]
        self.linears = nn.ModuleList()
        self.bns = nn.ModuleList()
        for oc in ocs:
            self.linears.append(nn.Linear(in_c, oc))
            self.bns.append(nn.BatchNorm1d(oc, eps=1e-5))
            in_c = oc

    def forward(self, x):  # (B,N,C)
        for linear, bn in zip(self.linears, self.bns):
            x = linear(x)
            x = bn(x.transpose(1, 2)).transpose(1, 2)
            x = F.relu(x)
        return x


class SE3dT(nn.Module):
    def __init__(self, channel, reduction=8):
        super().__init__()
        self.fc1 = nn.Linear(channel, channel // reduction, bias=False)
        self.fc2 = nn.Linear(channel // reduction, channel, bias=False)

    def forward(self, grid):  # (B,r,r,r,C)
        g = grid.mean(dim=(1, 2, 3))
        g = torch.sigmoid(self.fc2(F.relu(self.fc1(g))))
        return grid * g[:, None, None, None, :]


class PVConvT(nn.Module):
    def __init__(self, in_c, out_c, resolution, with_se=True, eps=1e-6):
        super().__init__()
        self.r = resolution
        self.eps = eps
        self.conv0 = nn.Conv3d(in_c, out_c, 3, padding=1)
        self.bn0 = nn.BatchNorm3d(out_c, eps=1e-4)
        self.conv1 = nn.Conv3d(out_c, out_c, 3, padding=1)
        self.bn1 = nn.BatchNorm3d(out_c, eps=1e-4)
        self.se = SE3dT(out_c) if with_se else None
        self.point = SharedMLPT(in_c, out_c)

    def forward(self, feats, coords):  # (B,N,C),(B,N,3)
        nc, vc = normalize_coords_t(coords, self.r, self.eps)
        grid = avg_voxelize_t(feats, vc, self.r)               # NDHWC
        g = grid.permute(0, 4, 1, 2, 3)                        # NCDHW
        g = F.leaky_relu(self.bn0(self.conv0(g)), 0.1)
        g = F.leaky_relu(self.bn1(self.conv1(g)), 0.1)
        grid = g.permute(0, 2, 3, 4, 1)
        if self.se is not None:
            grid = self.se(grid)
        vox_feats = trilinear_devox_t(grid, nc, self.r)
        return vox_feats + self.point(feats), coords


def _make_norm_t(norm, channels, gn_groups):
    # reference _make_norm (models.py:313-319): batch/syncbn -> BatchNorm1d
    if norm in ("batch", "syncbn"):
        return nn.BatchNorm1d(channels, eps=1e-5)
    return nn.GroupNorm(gn_groups, channels, eps=1e-5)


class FiLM1dT(nn.Module):
    def __init__(self, channels, emb_dim, gn_groups, norm="group"):
        super().__init__()
        self.norm = _make_norm_t(norm, channels, gn_groups)
        self.affine = nn.Linear(emb_dim, channels * 2)

    def forward(self, x, emb):  # (B,N,C)
        y = self.norm(x.transpose(1, 2)).transpose(1, 2)
        gamma, beta = self.affine(emb).chunk(2, dim=-1)
        return y * (1.0 + gamma[:, None, :]) + beta[:, None, :]


class PVBlockT(nn.Module):
    def __init__(self, channels, resolution, emb_dim, with_se, gn_groups,
                 norm="group"):
        super().__init__()
        self.pvconv = PVConvT(channels, channels, resolution, with_se)
        self.post = SharedMLPT(channels, [channels])
        self.film = FiLM1dT(channels, emb_dim, gn_groups, norm=norm)

    def forward(self, f, c, emb):
        f, c = self.pvconv(f, c)
        f = self.post(f)
        return f + self.film(f, emb), c


class ContextNetT(nn.Module):
    def __init__(self, in_point_dim, cond_dim, emb_dim, ctx_dim,
                 stage_channels, stage_blocks, stage_res, with_se,
                 gn_groups, with_global, t_gate_k, t_gate_tau,
                 norm="group"):
        super().__init__()
        self.in_point_dim = in_point_dim
        self.emb_dim = emb_dim
        self.t_gate_k, self.t_gate_tau = t_gate_k, t_gate_tau
        self.with_global = with_global
        self.t_proj = nn.Linear(emb_dim, emb_dim)
        self.c_proj = nn.Linear(cond_dim if cond_dim > 0 else 1, emb_dim)
        in_c = emb_dim + 3 + (3 if in_point_dim == 6 else 0)
        self.projs = nn.ModuleList()
        self.stage_blocks = nn.ModuleList()
        for sc, nb, rs in zip(stage_channels, stage_blocks, stage_res):
            self.projs.append(SharedMLPT(in_c, [sc]))
            self.stage_blocks.append(nn.ModuleList(
                [PVBlockT(sc, rs, emb_dim, with_se, gn_groups, norm=norm)
                 for _ in range(nb)]))
            in_c = sc
        c_last = stage_channels[-1]
        if with_global:
            self.global_0 = nn.Linear(c_last, c_last)
            self.global_1 = nn.Linear(c_last, c_last)
        head_in = sum(stage_channels) + (c_last if with_global else 0)
        self.head_pre = nn.Linear(head_in, c_last)
        self.head_norm = _make_norm_t(norm, c_last, gn_groups)
        self.head_out = nn.Linear(c_last, ctx_dim)
        self.ctx_from_emb = nn.Linear(emb_dim, ctx_dim)

    def forward(self, x, t, cond):
        b, n, d = x.shape
        coords = x[..., :3]
        t_emb = F.silu(self.t_proj(timestep_embedding_t(t, self.emb_dim)))
        c_in = x.new_zeros((b, 1)) if cond is None else cond
        emb = t_emb + F.silu(self.c_proj(c_in))
        feats = [emb[:, None, :].expand(b, n, self.emb_dim), coords]
        if self.in_point_dim == 6 and d == 6:
            feats.append(x[..., 3:])
        f = torch.cat(feats, dim=-1)
        ms = []
        c = coords
        for proj, blocks in zip(self.projs, self.stage_blocks):
            f = proj(f)
            for blk in blocks:
                f, c = blk(f, c, emb)
            ms.append(f)
        if self.with_global:
            g = self.global_1(F.silu(self.global_0(f.max(dim=1).values)))
            ms.append(g[:, None, :].expand(-1, n, -1))
        h = self.head_pre(torch.cat(ms, dim=-1))
        h = F.silu(self.head_norm(h.transpose(1, 2)).transpose(1, 2))
        ctx_pv = self.head_out(h)
        ctx_glb = self.ctx_from_emb(emb)[:, None, :].expand_as(ctx_pv)
        alpha = torch.sigmoid(
            self.t_gate_k * (t.reshape(b, 1, 1) - self.t_gate_tau))
        return alpha * ctx_pv + (1 - alpha) * ctx_glb


# ---------------- transplant helpers ----------------

def shared_mlp_params(m: SharedMLPT):
    # pcfm SharedMLP has no dense bias (dead through BN); the torch bias is
    # folded into the BN running mean in shared_mlp_stats
    p = {}
    for i, (linear, bn) in enumerate(zip(m.linears, m.bns)):
        p[f"dense_{i}"] = {"kernel": lin(linear)["kernel"]}
        p[f"bn_{i}"] = {"scale": bn.weight.detach().numpy(),
                        "bias": bn.bias.detach().numpy()}
    return p


def shared_mlp_stats(m: SharedMLPT):
    # eval-mode equivalence: BN((xW + b)) with stats (mu, var) ==
    # BN(xW) with stats (mu - b, var)
    return {f"bn_{i}": {"mean": (bn.running_mean
                                 - linear.bias).detach().numpy(),
                        "var": bn.running_var.detach().numpy()}
            for i, (linear, bn) in enumerate(zip(m.linears, m.bns))}


def conv3d_params(c: nn.Conv3d):
    return {"kernel": c.weight.detach().numpy().transpose(2, 3, 4, 1, 0)}


def pvconv_params(m: PVConvT):
    params = {"conv3d_0": conv3d_params(m.conv0),
              "bn3d_0": {"scale": m.bn0.weight.detach().numpy(),
                         "bias": m.bn0.bias.detach().numpy()},
              "conv3d_1": conv3d_params(m.conv1),
              "bn3d_1": {"scale": m.bn1.weight.detach().numpy(),
                         "bias": m.bn1.bias.detach().numpy()},
              "point_features": shared_mlp_params(m.point)}
    stats = {"bn3d_0": {"mean": (m.bn0.running_mean
                                 - m.conv0.bias).detach().numpy(),
                        "var": m.bn0.running_var.detach().numpy()},
             "bn3d_1": {"mean": (m.bn1.running_mean
                                 - m.conv1.bias).detach().numpy(),
                        "var": m.bn1.running_var.detach().numpy()},
             "point_features": shared_mlp_stats(m.point)}
    if m.se is not None:
        params["se"] = {"fc1": {"kernel":
                                m.se.fc1.weight.detach().numpy().T},
                        "fc2": {"kernel":
                                m.se.fc2.weight.detach().numpy().T}}
    return params, stats


def film1d_params(m: FiLM1dT):
    return {"norm": {"scale": m.norm.weight.detach().numpy(),
                     "bias": m.norm.bias.detach().numpy()},
            "affine": lin(m.affine)}


def context_net_params(m: ContextNetT):
    params = {"t_proj": lin(m.t_proj), "c_proj": lin(m.c_proj),
              "head_pre": lin(m.head_pre),
              "head_norm": {"scale": m.head_norm.weight.detach().numpy(),
                            "bias": m.head_norm.bias.detach().numpy()},
              "head_out": lin(m.head_out),
              "ctx_from_emb": lin(m.ctx_from_emb)}
    stats = {}
    if m.with_global:
        params["global_0"] = lin(m.global_0)
        params["global_1"] = lin(m.global_1)
    for si, (proj, blocks) in enumerate(zip(m.projs, m.stage_blocks)):
        sp = {"proj": shared_mlp_params(proj)}
        ss = {"proj": shared_mlp_stats(proj)}
        for bi, blk in enumerate(blocks):
            pv_p, pv_s = pvconv_params(blk.pvconv)
            sp[f"block_{bi}"] = {"pvconv": pv_p,
                                 "post": shared_mlp_params(blk.post),
                                 "film": film1d_params(blk.film)}
            ss[f"block_{bi}"] = {"pvconv": pv_s,
                                 "post": shared_mlp_stats(blk.post)}
        params[f"stage_{si}"] = sp
        stats[f"stage_{si}"] = ss
    return params, stats


class VelocityNetWithContextT(nn.Module):
    """Mirror of reference VelocityNetWithContext (models.py:546-601)."""

    def __init__(self, cond_dim, point_dim, ctx_dim, width, depth, emb_dim):
        super().__init__()
        self.cond_dim, self.point_dim, self.emb_dim = cond_dim, point_dim, \
            emb_dim
        self.t_proj = nn.Linear(emb_dim, emb_dim)
        self.c_proj = nn.Linear(cond_dim if cond_dim > 0 else 1, emb_dim)
        self.input = nn.Linear(point_dim + ctx_dim + emb_dim, width)
        self.blocks = nn.ModuleList(
            [nn.Sequential(nn.SiLU(), nn.Linear(width, width))
             for _ in range(depth - 1)])
        from tests.torch_mirror import FiLMBlockT
        self.films = nn.ModuleList(
            [FiLMBlockT(width, emb_dim) for _ in range(depth - 1)])
        self.out = nn.Sequential(nn.SiLU(), nn.Linear(width, point_dim))

    def forward(self, x, t, cond, ctx, cond_drop_mask=None):
        b, n, _ = x.shape
        t_emb = F.silu(self.t_proj(timestep_embedding_t(t, self.emb_dim)))
        if self.cond_dim > 0 and cond is not None:
            if cond_drop_mask is not None:
                cond = cond * (1.0 - cond_drop_mask)
            c_in = cond
        else:
            c_in = x.new_zeros((b, 1))
        emb = t_emb + F.silu(self.c_proj(c_in))
        emb_bn = emb[:, None, :].expand(b, n, -1).reshape(b * n, -1)
        h = torch.cat([x, ctx, emb[:, None, :].expand(b, n, -1)],
                      dim=-1).reshape(b * n, -1)
        h = self.input(h)
        for blk, fim in zip(self.blocks, self.films):
            h = fim(h, emb_bn)
            h = h + blk(h)
        return self.out(h).reshape(b, n, self.point_dim)


class HybridMLPT(nn.Module):
    """Mirror of reference HybridMLP (models.py:604-694)."""

    def __init__(self, cond_dim, point_dim, ctx_kw, head_kw):
        super().__init__()
        self.cond_dim = cond_dim
        self.ctx_net = ContextNetT(in_point_dim=point_dim,
                                   cond_dim=cond_dim, **ctx_kw)
        self.head = VelocityNetWithContextT(cond_dim=cond_dim,
                                            point_dim=point_dim, **head_kw)

    def forward(self, x, t, cond, cond_drop_mask=None):
        cond_eff = cond
        if cond is not None and cond_drop_mask is not None:
            cond_eff = cond * (1.0 - cond_drop_mask)
        ctx = self.ctx_net(x, t, cond_eff if self.cond_dim > 0 else None)
        return self.head(x, t, cond, ctx, cond_drop_mask=cond_drop_mask)


def velocity_ctx_params(m: VelocityNetWithContextT, depth: int):
    from tests.torch_mirror import lin as _lin
    p = {"t_proj": _lin(m.t_proj), "c_proj": _lin(m.c_proj),
         "input": _lin(m.input), "out": _lin(m.out[1])}
    for i in range(depth - 1):
        p[f"block_{i}"] = _lin(m.blocks[i][1])
        p[f"film_{i}"] = {
            "norm": {"scale": m.films[i].norm.weight.detach().numpy(),
                     "bias": m.films[i].norm.bias.detach().numpy()},
            "affine": _lin(m.films[i].affine)}
    return p


def hybrid_params(m: HybridMLPT, head_depth: int):
    ctx_p, ctx_s = context_net_params(m.ctx_net)
    return ({"ctx_net": ctx_p,
             "head": velocity_ctx_params(m.head, head_depth)},
            {"ctx_net": ctx_s})
