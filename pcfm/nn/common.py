"""Shared initializers / norm helpers matching the reference's torch inits.

Reference init conventions (models.py):
  * Kaiming normal fan_in / relu gain on trunk Linears, zero bias
    (models.py:109-116 etc.) -> ``kaiming_normal``
  * N(0, 0.02) on t_proj / c_proj weights (models.py:99-100)
  * zero-init FiLM affines and output heads for identity start
GroupNorm group selection ports models.py:297-319.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax.nn.initializers import normal, variance_scaling

# torch kaiming_normal_(nonlinearity="relu", mode="fan_in") == untruncated
# normal with std sqrt(2/fan_in)
kaiming_normal = variance_scaling(2.0, "fan_in", "normal")
normal02 = normal(stddev=0.02)


def _gcd(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return max(a, 1)


def choose_gn_groups(channels: int, prefer: int = 32) -> int:
    """Port of models.py:303-310."""
    prefer = min(prefer, channels)
    g = _gcd(channels, prefer)
    if g == 1 and channels >= 16:
        for cand in [32, 16, 8, 4, 2]:
            if channels % cand == 0 and cand <= channels:
                return cand
    return g


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, **kwargs):
        return x


def make_norm(norm_type: str, channels: int, gn_groups: int = 32,
              name: str | None = None):
    """Port of models.py:313-319 for (B, N, C) channel-last tensors.

    'syncbn' maps to BatchNorm like the reference does (models.py:316 maps
    both 'batch' and 'syncbn' to plain BatchNorm1d); under GSPMD data
    parallelism our BatchNorm stats are computed over the global batch,
    which actually IS sync-BN — strictly stronger than the reference.
    """
    if norm_type == "group":
        return nn.GroupNorm(num_groups=choose_gn_groups(channels, gn_groups),
                            epsilon=1e-5, name=name)
    elif norm_type in ("batch", "syncbn"):
        return BatchNorm1d(name=name)
    else:
        return Identity(name=name)


class BatchNorm1d(nn.Module):
    """BatchNorm over (batch, points) for (B, N, C) tensors — torch
    BatchNorm1d semantics (eps 1e-5, momentum 0.1)."""
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = nn.BatchNorm(use_running_average=not train,
                          momentum=1.0 - self.momentum, epsilon=self.eps,
                          axis=-1, dtype=jnp.float32, name="bn")
        return bn(x)
