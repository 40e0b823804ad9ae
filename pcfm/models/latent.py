"""ConditionalLatentVelocityNet — latent-space velocity field
(models.py:224-290): residual SiLU MLP on [y || emb(t, cond)].

The reference's ``euler_sample`` helper lives in ``pcfm.sample`` as a jitted
lax.scan integrator.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcfm.models.embeddings import timestep_embedding
from pcfm.nn.common import kaiming_normal, normal02


class ConditionalLatentVelocityNet(nn.Module):
    latent_dim: int
    cond_dim: int = 0
    width: int = 512
    depth: int = 6
    emb_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, t, cond: Optional[jax.Array] = None,
                 cond_drop_mask: Optional[jax.Array] = None):
        """y (B, Dz), t (B,), cond (B, C) or None -> v (B, Dz).

        ``cond_drop_mask`` is a (B, 1) {0,1} mask (1 -> dropped) — the
        traced-friendly form of the reference's ``cond_drop_p`` Bernoulli
        (models.py:261-263); the caller samples the mask.
        """
        b = y.shape[0]
        y = y.astype(self.dtype)
        t_emb = timestep_embedding(t.reshape(b), self.emb_dim).astype(
            self.dtype)
        t_emb = nn.silu(nn.Dense(self.emb_dim, dtype=self.dtype,
                                 kernel_init=normal02,
                                 bias_init=nn.initializers.zeros,
                                 name="t_proj")(t_emb))
        if self.cond_dim > 0 and cond is not None:
            if cond_drop_mask is not None:
                cond = cond * (1.0 - cond_drop_mask)
            c_in = cond.astype(self.dtype)
        else:
            c_in = jnp.zeros((b, self.cond_dim if self.cond_dim > 0 else 1),
                             self.dtype)
        c_emb = nn.silu(nn.Dense(self.emb_dim, dtype=self.dtype,
                                 kernel_init=normal02,
                                 bias_init=nn.initializers.zeros,
                                 name="c_proj")(c_in))
        emb = t_emb + c_emb

        h = jnp.concatenate([y, emb], axis=-1)
        h = nn.Dense(self.width, dtype=self.dtype, kernel_init=kaiming_normal,
                     bias_init=nn.initializers.zeros, name="input")(h)
        for i in range(self.depth - 1):
            blk = nn.Dense(self.width, dtype=self.dtype,
                           kernel_init=kaiming_normal,
                           bias_init=nn.initializers.zeros,
                           name=f"block_{i}")
            h = h + blk(nn.silu(h))
        v = nn.Dense(self.latent_dim, dtype=self.dtype,
                     kernel_init=kaiming_normal,
                     bias_init=nn.initializers.zeros,
                     name="out")(nn.silu(h))
        return v.astype(jnp.float32)
