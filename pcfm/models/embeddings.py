"""Timestep embedding — port of models.py:22-37."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def timestep_embedding(t: jax.Array, dim: int,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding of continuous t in [0,1].

    Args:
      t: (...,) per-batch scalars.
      dim: even embedding dimension.
    Returns:
      (..., dim) with cos || sin halves (reference order).
    """
    assert dim % 2 == 0, "timestep_embedding dim must be even"
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
