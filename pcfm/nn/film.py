"""FiLM conditioning blocks.

Ports of the reference FiLM modules:
  * ``FiLMBlock`` — models.py:62-79: LayerNorm -> (1+gamma)h + beta from a
    per-batch embedding; affine bias zero-init.
  * ``FiLM1d`` — models.py:322-346: norm -> (1+gamma)x + beta on per-point
    features, gamma/beta fully zero-init (identity start).

Channel-last: features are (B, N, C) (the reference's (B*N, C) flatten and
(B, C, N) layouts both map here), emb is (B, E) and broadcasts over N.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pcfm.nn.common import make_norm


class FiLMBlock(nn.Module):
    """LayerNorm + FiLM from embedding (reference FiLMBlock)."""
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, emb):
        # torch LayerNorm eps=1e-5 with learned affine
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(h)
        affine = nn.Dense(2 * self.width, dtype=self.dtype,
                          kernel_init=nn.initializers.lecun_normal(),
                          bias_init=nn.initializers.zeros, name="affine")
        gamma, beta = jnp.split(affine(emb), 2, axis=-1)            # (B, C) x2
        if h.ndim == 3:
            gamma, beta = gamma[:, None, :], beta[:, None, :]
        return h * (1.0 + gamma) + beta


class FiLM1d(nn.Module):
    """Norm + zero-init FiLM on (B, N, C) features (reference _FiLM1d)."""
    channels: int
    norm_type: str = "group"
    gn_groups: int = 32
    one_plus: bool = True

    @nn.compact
    def __call__(self, x, emb, train: bool = True):
        norm = make_norm(self.norm_type, self.channels, self.gn_groups,
                         name="norm")
        y = norm(x, train=train) if self.norm_type in ("batch", "syncbn") \
            else norm(x)
        affine = nn.Dense(2 * self.channels,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros, name="affine")
        gamma, beta = jnp.split(affine(emb.astype(y.dtype)), 2, axis=-1)
        gamma, beta = gamma[:, None, :], beta[:, None, :]
        if self.one_plus:
            return y * (1.0 + gamma) + beta
        return y * gamma + beta
