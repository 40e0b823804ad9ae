"""ContextNet — multi-scale PVConv pyramid producing per-point context.

Port of models.py:349-543 (_PVBlock / _PVStage / ContextNet):
  * stem = [emb(t,cond) broadcast || xyz (|| rgb)]
  * stages of SharedMLP channel lift + k x (PVConv -> SharedMLP -> FiLM
    residual) at decreasing voxel resolutions
  * optional global max-pool branch
  * multi-scale concat -> 1x1 head with ZERO-INIT output (identity start)
  * t-gate: alpha = sigmoid(k (t - tau)) blends PV context vs. an
    emb-only global context (models.py:534-539)

Precision: the reference forces ``autocast(enabled=False)`` here
(models.py:513) — an fp32 island.  That guard exists for GPU fp16, whose
5-bit exponent underflows in BN statistics; TPU bf16 keeps fp32's 8-bit
exponent and flax norm layers accumulate statistics in fp32 regardless of
the compute dtype, so the island is parameterized instead:
``island_dtype`` (module default fp32 = exact reference semantics; the
Config default is bf16 — `--ctx_dtype fp32` restores the island).  Voxel
COORDINATE math always stays fp32 (rounding to voxel ids in bf16 would
move points across voxel boundaries).  Validated by the full-size
convergence run (docs/convergence.md) and fp32-tolerance transplant tests.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcfm.models.embeddings import timestep_embedding
from pcfm.nn.common import kaiming_normal, make_norm, normal02
from pcfm.nn.film import FiLM1d
from pcfm.nn.pvconv import PVConv
from pcfm.nn.shared_mlp import SharedMLP


# normalize_coords eps shared by the entry sort, the stage caches and
# every in-block Voxelization — all three must agree (see ContextNet)
VOXEL_EPS = 1e-6


class PVBlock(nn.Module):
    """PVConv -> SharedMLP(1x1) -> residual FiLM (models.py:349-368)."""
    channels: int
    resolution: int
    with_se: bool
    norm_type: str = "group"
    gn_groups: int = 32
    voxel_normalize: bool = True
    eps: float = VOXEL_EPS
    voxel_backend: str = "xla"
    sorted_at_res: int = -1
    bn_impl: str = ""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f, c, emb, train: bool = True,
                 cache: dict | None = None):
        f, c = PVConv(self.channels, kernel_size=3,
                      resolution=self.resolution, with_se=self.with_se,
                      normalize=self.voxel_normalize, eps=self.eps,
                      dtype=self.dtype, voxel_backend=self.voxel_backend,
                      sorted_at_res=self.sorted_at_res,
                      bn_impl=self.bn_impl,
                      name="pvconv")(f, c, train=train, cache=cache)
        f = SharedMLP(self.channels, dtype=self.dtype,
                      name="post")(f, train=train)
        film = FiLM1d(self.channels, norm_type=self.norm_type,
                      gn_groups=self.gn_groups, name="film")
        f = f + film(f, emb, train=train)
        return f, c


class PVStage(nn.Module):
    """SharedMLP channel lift -> num_blocks x PVBlock (models.py:371-389)."""
    out_channels: int
    num_blocks: int
    resolution: int
    with_se: bool
    norm_type: str = "group"
    gn_groups: int = 32
    voxel_normalize: bool = True
    voxel_backend: str = "xla"
    sorted_at_res: int = -1
    bn_impl: str = ""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f, c, emb, train: bool = True,
                 cache: dict | None = None):
        f = SharedMLP(self.out_channels, dtype=self.dtype,
                      name="proj")(f, train=train)
        for i in range(self.num_blocks):
            f, c = PVBlock(self.out_channels, self.resolution, self.with_se,
                           norm_type=self.norm_type, gn_groups=self.gn_groups,
                           voxel_normalize=self.voxel_normalize,
                           voxel_backend=self.voxel_backend,
                           sorted_at_res=self.sorted_at_res,
                           bn_impl=self.bn_impl,
                           dtype=self.dtype,
                           name=f"block_{i}")(f, c, emb, train=train,
                                              cache=cache)
        return f, c


class ContextNet(nn.Module):
    in_point_dim: int                   # 3 / 6
    cond_dim: int
    emb_dim: int = 256
    ctx_dim: int = 64
    stage_channels: Sequence[int] = (128, 256, 256)
    stage_blocks: Sequence[int] = (2, 2, 2)
    stage_res: Sequence[int] = (32, 16, 8)
    with_se: bool = True
    norm_type: str = "group"
    gn_groups: int = 32
    with_global: bool = True
    voxel_normalize: bool = True
    use_t_gate: bool = True
    t_gate_k: float = 10.0
    t_gate_tau: float = 0.4
    voxel_backend: str = "xla"       # "xla" | "sorted" (see pvconv.py)
    bn_impl: str = ""                # grid-BN impl ("" -> pvconv.BN_IMPL)
    island_dtype: jnp.dtype = jnp.float32   # bf16: TPU-first (see docstring)

    @nn.compact
    def __call__(self, x, t, cond: Optional[jax.Array],
                 train: bool = True):
        """x (B,N,3|6), t (B,), cond (B,C) -> ctx (B,N,ctx_dim)."""
        assert len(self.stage_channels) == len(self.stage_blocks) \
            == len(self.stage_res)
        b, n, d = x.shape
        out_dtype = x.dtype
        # ---- precision island from here on (models.py:513): features in
        # island_dtype, coordinates + norm statistics always fp32 ----
        x = x.astype(jnp.float32)

        # sorted-window voxel backend: sort points ONCE by their stage-0
        # voxel id (every op inside is permutation-equivariant) and invert
        # at exit; the PVConv scatters/gathers then hit narrow id windows
        # (pcfm/ops/pallas/voxel_sorted.py).  Gate on the SAME per-stage
        # predicate the PVConvs use (review: a duplicated R^3 literal
        # ignored the N gate, paying the entry sort when every stage
        # would fall back to XLA anyway)
        from pcfm.nn.pvconv import _interp, _use_sorted
        use_sorted = (self.voxel_backend == "sorted"
                      and any(_use_sorted(self.voxel_backend, int(r), b, n)
                              for r in self.stage_res))
        perm = inv = None
        from pcfm.parallel.sp_context import sp_mesh_for
        sp_mesh = sp_mesh_for(b, n)
        if use_sorted and sp_mesh is not None:
            # points sharded: SHARD-LOCAL sort (a global argsort would
            # all-gather the point axis; the window kernels only need
            # within-tile id locality, which a local sort provides)
            from pcfm.parallel.sp_sorted import (shmap_permute,
                                                 shmap_sort_perm)
            perm, inv = shmap_sort_perm(
                sp_mesh, x[..., :3], int(self.stage_res[0]),
                normalize=self.voxel_normalize, eps=VOXEL_EPS)
            x = shmap_permute(sp_mesh, x, perm, inv)
        elif use_sorted:
            from pcfm.ops.voxel_sorted import (permute_points,
                                               sort_perm_by_voxel,
                                               unpermute_points)
            # eps MUST match the in-block Voxelization / stage-cache
            # normalize (PVBlock.eps): a different denominator can move a
            # knife-edge point across a voxel boundary, breaking the
            # contiguous-run assumption of inv_counts_per_point
            perm, inv = sort_perm_by_voxel(
                x[..., :3], int(self.stage_res[0]),
                normalize=self.voxel_normalize, eps=VOXEL_EPS)
            x = permute_points(x, perm, inv)

        coords = x[..., :3]
        t = t.reshape(b).astype(jnp.float32)

        t_emb = nn.silu(nn.Dense(self.emb_dim, kernel_init=normal02,
                                 bias_init=nn.initializers.zeros,
                                 name="t_proj")(
            timestep_embedding(t, self.emb_dim)))
        if cond is None or (hasattr(cond, "size") and cond.size == 0):
            # zero vector at the MODEL's cond width — (b, 1) would give
            # c_proj an input-dependent kernel shape when cond_dim > 0
            # (review; matches _t_c_embed in velocity.py)
            c_in = jnp.zeros((b, self.cond_dim if self.cond_dim > 0
                              else 1), jnp.float32)
        else:
            c_in = cond.astype(jnp.float32)
        c_emb = nn.silu(nn.Dense(self.emb_dim, kernel_init=normal02,
                                 bias_init=nn.initializers.zeros,
                                 name="c_proj")(c_in))
        emb = t_emb + c_emb                                         # (B,E)

        assert d == self.in_point_dim, \
            f"ContextNet expected in_point_dim={self.in_point_dim}, got {d}"
        feats = [jnp.broadcast_to(emb[:, None, :], (b, n, self.emb_dim)),
                 coords]
        if self.in_point_dim == 6:
            feats.append(x[..., 3:])
        f = jnp.concatenate(feats, axis=-1).astype(
            self.island_dtype)                                      # (B,N,C_in)

        # per-resolution voxel metadata, computed ONCE and shared by every
        # PVConv at that resolution (coords are constant across stages)
        caches: dict = {}
        if use_sorted:
            from pcfm.ops.voxel_sorted import build_stage_cache
            for rs in dict.fromkeys(int(r) for r in self.stage_res):
                if not _use_sorted(self.voxel_backend, rs, b, n):
                    continue
                if sp_mesh is not None:
                    from pcfm.parallel.sp_sorted import shmap_stage_cache
                    caches[rs] = shmap_stage_cache(
                        sp_mesh, coords, rs,
                        normalize=self.voxel_normalize, eps=VOXEL_EPS,
                        interpret=_interp())
                else:
                    caches[rs] = build_stage_cache(
                        coords, rs, int(self.stage_res[0]),
                        normalize=self.voxel_normalize, eps=VOXEL_EPS,
                        interpret=_interp())

        ms_feats = []
        c = coords
        for i, (sc, nb, rs) in enumerate(zip(self.stage_channels,
                                             self.stage_blocks,
                                             self.stage_res)):
            f, c = PVStage(sc, nb, rs, self.with_se,
                           norm_type=self.norm_type,
                           gn_groups=self.gn_groups,
                           voxel_normalize=self.voxel_normalize,
                           voxel_backend=(self.voxel_backend if use_sorted
                                          else "xla"),
                           sorted_at_res=int(self.stage_res[0]),
                           bn_impl=self.bn_impl,
                           dtype=self.island_dtype,
                           name=f"stage_{i}")(f, c, emb, train=train,
                                              cache=caches.get(int(rs)))
            ms_feats.append(f)

        if self.with_global:
            c_last = self.stage_channels[-1]
            g = jnp.max(f, axis=1)                                  # (B,C_last)
            g = nn.Dense(c_last, kernel_init=kaiming_normal,
                         bias_init=nn.initializers.zeros,
                         name="global_0")(g)
            g = nn.silu(g)
            g = nn.Dense(c_last, kernel_init=kaiming_normal,
                         bias_init=nn.initializers.zeros,
                         name="global_1")(g)
            ms_feats.append(jnp.broadcast_to(g[:, None, :], f.shape))

        f_cat = jnp.concatenate(ms_feats, axis=-1)

        h = nn.Dense(self.stage_channels[-1], kernel_init=kaiming_normal,
                     bias_init=nn.initializers.zeros, name="head_pre")(f_cat)
        norm = make_norm(self.norm_type, self.stage_channels[-1],
                         self.gn_groups, name="head_norm")
        h = norm(h, train=train) if self.norm_type in ("batch", "syncbn") \
            else norm(h)
        h = nn.silu(h)
        # zero-init output: ctx_pv starts exactly at 0 (models.py:468)
        ctx_pv = nn.Dense(self.ctx_dim, kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="head_out")(h)                       # (B,N,ctx)

        if self.use_t_gate:
            ctx_glb = nn.Dense(self.ctx_dim, kernel_init=kaiming_normal,
                               bias_init=nn.initializers.zeros,
                               name="ctx_from_emb")(emb)            # (B,ctx)
            ctx_glb = jnp.broadcast_to(ctx_glb[:, None, :], ctx_pv.shape)
            alpha = jax.nn.sigmoid(
                self.t_gate_k * (t[:, None, None] - self.t_gate_tau))
            ctx = alpha * ctx_pv + (1.0 - alpha) * ctx_glb
        else:
            ctx = ctx_pv
        if use_sorted and sp_mesh is not None:
            from pcfm.parallel.sp_sorted import shmap_permute
            ctx = shmap_permute(sp_mesh, ctx, inv, perm)   # unpermute
        elif use_sorted:
            from pcfm.ops.voxel_sorted import unpermute_points
            ctx = unpermute_points(ctx, perm, inv)
        return ctx.astype(out_dtype)
