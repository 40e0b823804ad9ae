"""Per-point velocity networks.

Ports of the reference (models.py):
  * ``VelocityNet`` (models.py:82-153) — the ``mlp`` point-flow backbone:
    per-point residual MLP on [x || emb(t, cond)] with FiLM between blocks.
  * ``VelocityNetWithContext`` (models.py:546-601) — the hybrid head on
    [x || ctx || emb].
  * ``MLP`` (models.py:40-59) — generic SiLU MLP.

TPU notes: everything is (B, N, C) channel-last; the (B*N, width) GEMMs of
the reference become (B, N, width) batched matmuls that XLA tiles onto the
MXU directly.  CFG condition-drop is the mask form ``cond * (1 - mask)``
(mask (B,1), 1 -> dropped).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcfm.models.embeddings import timestep_embedding
from pcfm.nn.common import kaiming_normal, normal02
from pcfm.nn.film import FiLMBlock


class _NormParams(nn.Module):
    """Parameter shell matching nn.LayerNorm's tree (scale, bias)."""
    width: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.width,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.width,),
                       jnp.float32)
        return s, b


class _FiLMShell(nn.Module):
    """Parameter-compatible shell of FiLMBlock: creates the identical
    param tree (norm/{scale,bias}, affine/{kernel,bias}) but returns the
    raw (s, t, gamma, beta) for the fused kernel instead of applying."""
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        s, t = _NormParams(self.width, name="norm")()
        affine = nn.Dense(2 * self.width, dtype=self.dtype,
                          kernel_init=nn.initializers.lecun_normal(),
                          bias_init=nn.initializers.zeros, name="affine")
        gamma, beta = jnp.split(affine(emb), 2, axis=-1)
        return s, t, gamma, beta


class _DenseParams(nn.Module):
    """Parameter shell matching nn.Dense's tree (kernel, bias)."""
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", kaiming_normal,
                       (self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


def _trunk(mdl, h, emb, width, depth, dtype, fused: bool,
           film_every: int = 1):
    """The shared residual trunk: depth-1 x [FiLM -> h + Dense(silu(h))].

    ``fused=True`` routes each block through the single-pass Pallas kernel
    (pcfm/ops/pallas/film_block.py) with an IDENTICAL parameter tree, so
    checkpoints and torch transplants are interchangeable between paths.

    ``film_every=k`` (opt-in turbo, Config ``pf_film_every``) applies the
    FiLM (LayerNorm + emb modulation) only on every k-th block — the
    trunk is VPU/HBM joint-bound (ROADMAP #2: the LN/FiLM/silu
    elementwise chain over B*N rows costs as much as the GEMMs), so
    halving the FiLM passes trades a little conditioning granularity for
    step time.  k=1 is the reference-parity architecture; the residual
    Dense stack is unchanged either way.
    """
    if fused:
        from pcfm.ops.pallas.film_block import film_block
        interp = jax.default_backend() != "tpu"
        for i in range(depth - 1):
            if i % film_every == 0:
                s, t, gamma, beta = _FiLMShell(width, dtype=dtype,
                                               name=f"film_{i}")(emb)
                w, b = _DenseParams(width, width, name=f"block_{i}")()
                h = film_block(h, s, t, gamma, beta, w, b, interp)
            else:
                blk = nn.Dense(width, dtype=dtype,
                               kernel_init=kaiming_normal,
                               bias_init=nn.initializers.zeros,
                               name=f"block_{i}")
                h = h + blk(nn.silu(h))
        return h
    for i in range(depth - 1):
        if i % film_every == 0:
            h = FiLMBlock(width, dtype=dtype, name=f"film_{i}")(h, emb)
        blk = nn.Dense(width, dtype=dtype, kernel_init=kaiming_normal,
                       bias_init=nn.initializers.zeros, name=f"block_{i}")
        h = h + blk(nn.silu(h))
    return h


def _use_fused_trunk(flag: str, width: int) -> bool:
    """"auto" resolves to OFF: measured on v5e (scripts/probe_film.py),
    XLA already pipelines the trunk block into 4 fusions totalling
    ~3.0 ms/block (dW GEMM at 85% MFU) and the single-pass kernel loses
    (~4.8 ms fwd — VPU LN/silu serializes against the MXU dot).  Kept as
    an opt-in for future Mosaic scheduling improvements."""
    if flag != "on" or width % 128 != 0:
        return False
    return True


class MLP(nn.Module):
    """Generic SiLU MLP with Kaiming init (reference models.py:40-59)."""
    out_dim: int
    width: int = 256
    depth: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth - 1):
            x = nn.Dense(self.width, dtype=self.dtype,
                         kernel_init=kaiming_normal,
                         bias_init=nn.initializers.zeros,
                         name=f"dense_{i}")(x)
            x = nn.silu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout,
                               deterministic=deterministic)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        kernel_init=kaiming_normal,
                        bias_init=nn.initializers.zeros, name="out")(x)


def _t_c_embed(mdl, t, cond, cond_drop_mask, cond_dim, emb_dim, dtype,
               batch):
    """Shared [t_emb + c_emb] computation (models.py:124-134)."""
    t = t.reshape(batch)
    t_emb = timestep_embedding(t, emb_dim).astype(dtype)
    t_emb = nn.silu(nn.Dense(emb_dim, dtype=dtype, kernel_init=normal02,
                             bias_init=nn.initializers.zeros,
                             name="t_proj")(t_emb))
    if cond_dim > 0 and cond is not None:
        if cond_drop_mask is not None:
            cond = cond * (1.0 - cond_drop_mask)                    # 1 -> drop
        c_in = cond.astype(dtype)
    else:
        c_in = jnp.zeros((batch, cond_dim if cond_dim > 0 else 1), dtype)
    c_emb = nn.silu(nn.Dense(emb_dim, dtype=dtype, kernel_init=normal02,
                             bias_init=nn.initializers.zeros,
                             name="c_proj")(c_in))
    return t_emb + c_emb


class VelocityNet(nn.Module):
    """Per-point MLP velocity field v_theta(x, t, cond) (pf_backbone=mlp)."""
    cond_dim: int
    width: int = 512
    depth: int = 6
    emb_dim: int = 256
    cfg_dropout_p: float = 0.1
    point_dim: int = 3
    dtype: jnp.dtype = jnp.float32
    fused_trunk: str = "auto"         # auto|on|off (pallas film_block)
    film_every: int = 1               # opt-in turbo trunk (see _trunk)

    @nn.compact
    def __call__(self, x, t, cond: Optional[jax.Array],
                 cond_drop_mask: Optional[jax.Array] = None):
        b, n, d = x.shape
        assert d == self.point_dim, \
            f"VelocityNet expected point_dim={self.point_dim}, got {d}"
        x = x.astype(self.dtype)
        emb = _t_c_embed(self, t, cond, cond_drop_mask, self.cond_dim,
                         self.emb_dim, self.dtype, b)               # (B,E)

        h = jnp.concatenate(
            [x, jnp.broadcast_to(emb[:, None, :], (b, n, self.emb_dim))],
            axis=-1)
        h = nn.Dense(self.width, dtype=self.dtype, kernel_init=kaiming_normal,
                     bias_init=nn.initializers.zeros, name="input")(h)
        h = _trunk(self, h, emb, self.width, self.depth, self.dtype,
                   _use_fused_trunk(self.fused_trunk, self.width),
                   film_every=self.film_every)
        v = nn.Dense(self.point_dim, dtype=self.dtype,
                     kernel_init=kaiming_normal,
                     bias_init=nn.initializers.zeros,
                     name="out")(nn.silu(h))
        return v.astype(jnp.float32)


class VelocityNetWithContext(nn.Module):
    """Hybrid head: per-point MLP on [x || ctx || emb] (models.py:546-601)."""
    cond_dim: int
    point_dim: int = 3
    ctx_dim: int = 64
    width: int = 512
    depth: int = 6
    emb_dim: int = 256
    cfg_dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32
    fused_trunk: str = "auto"         # auto|on|off (pallas film_block)
    film_every: int = 1               # opt-in turbo trunk (see _trunk)

    @nn.compact
    def __call__(self, x, t, cond: Optional[jax.Array], ctx,
                 cond_drop_mask: Optional[jax.Array] = None):
        b, n, d = x.shape
        assert ctx.shape[:2] == (b, n), \
            f"ctx shape mismatch: {ctx.shape} vs {(b, n)}"
        x = x.astype(self.dtype)
        emb = _t_c_embed(self, t, cond, cond_drop_mask, self.cond_dim,
                         self.emb_dim, self.dtype, b)

        h = jnp.concatenate(
            [x, ctx.astype(self.dtype),
             jnp.broadcast_to(emb[:, None, :], (b, n, self.emb_dim))],
            axis=-1)
        h = nn.Dense(self.width, dtype=self.dtype, kernel_init=kaiming_normal,
                     bias_init=nn.initializers.zeros, name="input")(h)
        h = _trunk(self, h, emb, self.width, self.depth, self.dtype,
                   _use_fused_trunk(self.fused_trunk, self.width),
                   film_every=self.film_every)
        v = nn.Dense(self.point_dim, dtype=self.dtype,
                     kernel_init=kaiming_normal,
                     bias_init=nn.initializers.zeros,
                     name="out")(nn.silu(h))
        return v.astype(jnp.float32)
