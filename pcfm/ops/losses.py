"""Loss primitives — port of `third_party/pvcnn/modules/functional/loss.py`."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """KL(softmax(stop_grad(x)) || softmax(y)) along axis 1, batch-meaned."""
    p = jax.nn.softmax(jax.lax.stop_gradient(x), axis=1)
    log_q = jax.nn.log_softmax(y, axis=1)
    return jnp.mean(jnp.sum(p * (jnp.log(p) - log_q), axis=1))


def huber_loss(error: jax.Array, delta: float) -> jax.Array:
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    losses = 0.5 * quadratic**2 + delta * (abs_error - quadratic)
    return jnp.mean(losses)
