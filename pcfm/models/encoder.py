"""ShapeEncoder — PointNet-lite encoder (models.py:156-187).

3 shared Dense+SiLU layers -> max-pool over points -> head -> latent z.
Returns (z, per-point features h) like the reference.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pcfm.nn.common import kaiming_normal


class ShapeEncoder(nn.Module):
    latent_dim: int = 256
    width: int = 128
    depth: int = 4
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts):
        """pts (B, N, in_channels) -> (z (B, latent), h (B, N, width))."""
        h = pts.astype(self.dtype)
        for i in range(3):
            h = nn.Dense(self.width, dtype=self.dtype,
                         kernel_init=kaiming_normal,
                         bias_init=nn.initializers.zeros,
                         name=f"mlp_{i}")(h)
            h = nn.silu(h)
        g = jnp.max(h, axis=1)                                      # (B, C)
        d = g
        for i in range(max(1, self.depth - 3)):
            d = nn.Dense(self.width, dtype=self.dtype,
                         kernel_init=kaiming_normal,
                         bias_init=nn.initializers.zeros,
                         name=f"head_{i}")(d)
            d = nn.silu(d)
        z = nn.Dense(self.latent_dim, dtype=self.dtype,
                     kernel_init=kaiming_normal,
                     bias_init=nn.initializers.zeros, name="head_out")(d)
        return z.astype(jnp.float32), h
