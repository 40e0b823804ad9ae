"""HybridMLP — ContextNet + per-point velocity head (models.py:604-694).

Forward: cond_eff = cond * (1 - mask) feeds ContextNet; the head receives
cond + mask separately (models.py:675-684).  The CFG unconditional branch
of the reference (zero-cond for hybrid, models.py:691-694; mask=1 for the
mlp VelocityNet, models.py:145-153) both reduce to "condition zeroed", so
``pcfm.sample.guided_velocity`` uses one batched two-branch evaluation for
either backbone.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcfm.models.context import ContextNet
from pcfm.models.velocity import VelocityNetWithContext


class HybridMLP(nn.Module):
    cond_dim: int
    point_dim: int = 3
    # context branch
    ctx_dim: int = 64
    ctx_emb_dim: int = 256
    stage_channels: Sequence[int] = (128, 256, 256)
    stage_blocks: Sequence[int] = (2, 2, 2)
    stage_res: Sequence[int] = (32, 16, 8)
    with_se: bool = True
    norm_type: str = "group"
    gn_groups: int = 32
    with_global: bool = True
    voxel_normalize: bool = True
    # t-gate
    use_t_gate: bool = True
    t_gate_k: float = 10.0
    t_gate_tau: float = 0.8
    # per-point head
    pf_width: int = 512
    pf_depth: int = 6
    pf_emb_dim: int = 256
    cfg_dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32
    voxel_backend: str = "xla"
    bn_impl: str = ""                 # grid-BN impl ("" -> pvconv.BN_IMPL)
    fused_trunk: str = "auto"         # auto|on|off (pallas film_block)
    film_every: int = 1               # opt-in turbo head trunk
    ctx_island_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, cond: Optional[jax.Array],
                 cond_drop_mask: Optional[jax.Array] = None,
                 train: bool = True):
        """x (B,N,3|6), t (B,), cond (B,C) -> v (B,N,3|6)."""
        if cond is not None and cond_drop_mask is not None:
            cond_eff = cond * (1.0 - cond_drop_mask.astype(cond.dtype))
        else:
            cond_eff = cond
        ctx = ContextNet(
            in_point_dim=self.point_dim, cond_dim=self.cond_dim,
            emb_dim=self.ctx_emb_dim, ctx_dim=self.ctx_dim,
            stage_channels=tuple(self.stage_channels),
            stage_blocks=tuple(self.stage_blocks),
            stage_res=tuple(self.stage_res),
            with_se=self.with_se, norm_type=self.norm_type,
            gn_groups=self.gn_groups, with_global=self.with_global,
            voxel_normalize=self.voxel_normalize,
            use_t_gate=self.use_t_gate, t_gate_k=self.t_gate_k,
            t_gate_tau=self.t_gate_tau,
            voxel_backend=self.voxel_backend,
            bn_impl=self.bn_impl,
            island_dtype=self.ctx_island_dtype, name="ctx_net",
        )(x, t, cond_eff if self.cond_dim > 0 else None, train=train)

        v = VelocityNetWithContext(
            cond_dim=self.cond_dim, point_dim=self.point_dim,
            ctx_dim=self.ctx_dim, width=self.pf_width, depth=self.pf_depth,
            emb_dim=self.pf_emb_dim, cfg_dropout_p=self.cfg_dropout_p,
            dtype=self.dtype, fused_trunk=self.fused_trunk,
            film_every=self.film_every, name="head",
        )(x, t, cond, ctx, cond_drop_mask=cond_drop_mask)
        return v
