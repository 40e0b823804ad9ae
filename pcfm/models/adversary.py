"""Gradient-reversal adversary (models.py:190-221).

``grad_reverse`` is a jax.custom_vjp identity that scales the cotangent by
-lambda; ``CondAdversary`` predicts the joint condition from z for GRL-based
removal of joint information (wired behind --lambda_adv).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcfm.nn.common import kaiming_normal


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def grad_reverse(x, lambd: float):
    return x


def _gr_fwd(x, lambd):
    return x, None


def _gr_bwd(lambd, _, g):
    return (jax.tree_util.tree_map(lambda t: -lambd * t, g),)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


class CondAdversary(nn.Module):
    """MLP predicting joints from z (models.py:204-221)."""
    cond_dim: int
    width: int = 256
    depth: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        h = z.astype(self.dtype)
        for i in range(self.depth - 1):
            h = nn.Dense(self.width, dtype=self.dtype,
                         kernel_init=kaiming_normal,
                         bias_init=nn.initializers.zeros,
                         name=f"dense_{i}")(h)
            h = nn.silu(h)
        return nn.Dense(self.cond_dim, dtype=self.dtype,
                        kernel_init=kaiming_normal,
                        bias_init=nn.initializers.zeros,
                        name="out")(h).astype(jnp.float32)
