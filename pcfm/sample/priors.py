"""Flow-matching priors (port of train.py:266-279 make_pf_prior_like)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def make_pf_prior(key: jax.Array, shape: tuple, point_prior_std: float = 1.0,
                  color_prior: str = "gauss",
                  color_prior_std: float = 1.0) -> jax.Array:
    """Sample the point-flow prior x0.

    Args:
      shape: (B, N, 3) or (B, N, 6).
      color_prior: 'gauss' | 'uniform' (U[0,1]) | 'zeros' for the RGB dims.
    """
    b, n, d = shape
    kx, kc = jax.random.split(key)
    xyz = jax.random.normal(kx, (b, n, 3), jnp.float32) * point_prior_std
    if d == 3:
        return xyz
    assert d == 6
    if color_prior == "gauss":
        rgb = jax.random.normal(kc, (b, n, 3), jnp.float32) * color_prior_std
    elif color_prior == "uniform":
        rgb = jax.random.uniform(kc, (b, n, 3), jnp.float32)
    elif color_prior == "zeros":
        rgb = jnp.zeros((b, n, 3), jnp.float32)
    else:
        raise ValueError(f"unknown color_prior '{color_prior}'")
    return jnp.concatenate([xyz, rgb], axis=-1)


def make_latent_prior(key: jax.Array, batch: int, latent_dim: int,
                      latent_prior_std: float = 1.0) -> jax.Array:
    return jax.random.normal(key, (batch, latent_dim),
                             jnp.float32) * latent_prior_std
