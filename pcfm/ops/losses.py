"""Loss primitives — port of `third_party/pvcnn/modules/functional/loss.py`."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """KL(softmax(stop_grad(x)) || softmax(y)) over the CLASS axis,
    batch-meaned.  The reference's dim=1 is the class axis of its
    channel-first (B, C, N) tensors (pvcnn modules/loss.py); this repo is
    channel-last (B, N, C), so the faithful port normalizes axis -1 —
    for 2-D (B, C) inputs the two agree (review: axis 1 softmaxed over
    the POINT axis for 3-D channel-last inputs)."""
    p = jax.nn.softmax(jax.lax.stop_gradient(x), axis=-1)
    log_q = jax.nn.log_softmax(y, axis=-1)
    return jnp.mean(jnp.sum(p * (jnp.log(p) - log_q), axis=-1))


def huber_loss(error: jax.Array, delta: float) -> jax.Array:
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    losses = 0.5 * quadratic**2 + delta * (abs_error - quadratic)
    return jnp.mean(losses)
