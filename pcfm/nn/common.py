"""Shared initializers / norm helpers matching the reference's torch inits.

Reference init conventions (models.py):
  * Kaiming normal fan_in / relu gain on trunk Linears, zero bias
    (models.py:109-116 etc.) -> ``kaiming_normal``
  * N(0, 0.02) on t_proj / c_proj weights (models.py:99-100)
  * zero-init FiLM affines and output heads for identity start
GroupNorm group selection ports models.py:297-319.
"""
from __future__ import annotations

import jax
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


class FlatBatchNorm(nn.Module):
    """BatchNorm over every non-channel axis, computed on a 2-D collapse.

    Drop-in replacement for ``nn.BatchNorm(axis=-1)`` with IDENTICAL
    param/batch_stats naming ({scale,bias} / {mean,var}) and flax
    fast-variance arithmetic (mean of squares minus squared mean, biased;
    ``y = (x - mean) * (scale * rsqrt(var + eps)) + bias``).

    Motivation (r4, ROADMAP #18): XLA lowers the 5-D NDHWC voxel-grid BN
    reduction through a channel-major transpose copy (~7 ms/step in the
    hybrid trace).  Collapsing to (B·D·H·W, C) FIRST keeps the stats
    reduce and its backward in the native minor-most-channel layout.
    ``dtype`` is the normalize/output dtype; stats math is always fp32.
    """
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x2 = x.reshape(-1, c).astype(jnp.float32)
            mean = jnp.mean(x2, axis=0)
            var = jnp.mean(jnp.square(x2), axis=0) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        return ((x.astype(self.dtype) - mean.astype(self.dtype)) * mul
                + bias.astype(self.dtype))
