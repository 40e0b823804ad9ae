"""Flat fused AdamW — one update over a raveled parameter vector.

The reference's optimizer is a single torch AdamW over 3 param groups
(train.py:249-253).  The optax equivalent (multi_transform of per-group
adamw) emits ~10 ops PER PARAMETER LEAF per step; the hybrid backbone has
~400 leaves, so optimizer+clip+EMA dispatch ~3-4k tiny TPU ops per step —
measured ~4.9k total ops/step in the trace, a multi-ms launch/stall tax
(ROADMAP "copy-start swarm").

This transformation ravels the gradient tree ONCE (a single fused concat),
runs AdamW + joint global-norm clip + warmup/cosine LR as ~15 fused
vector ops on the flat buffer, and unravels the update tree at the end.
Semantics match exactly:
  * optax.scale_by_adam bias correction (count+1 powers)
  * additive decoupled weight decay (optax.adamw wd), applied in the
    per-leaf epilogue (skips a param-sized ravel copy; bitwise equal)
  * per-GROUP base LR (enc/pf/lf/adv) as a per-leaf scalar in the same
    epilogue (cosine_lr is elementwise in the base LR)
  * joint clip over all groups BEFORE the moment update
    (reference train.py:653-657 clips before optimizer.step)
  * cosine/warmup schedule evaluated at the pre-increment count
    (optax.scale_by_schedule convention)

The grad-norm metric is exposed through the state (``opt_state.gnorm``)
so the train step needs no second reduction pass.
"""
from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class FlatAdamWState(NamedTuple):
    count: chex.Array     # int32 step
    m: chex.Array         # first moment, flat
    v: chex.Array         # second moment, flat
    gnorm: chex.Array     # global grad norm of the LAST update (metric)


def flat_adamw(base_lr_tree_fn, total_steps: int, *, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-8,
               weight_decay: float = 1e-4, clip_norm: float = 0.0,
               use_cosine: bool = True, min_lr: float = 1e-6,
               warmup_steps: int = 0) -> optax.GradientTransformation:
    """base_lr_tree_fn(params) -> pytree of per-leaf base LR scalars."""

    def init(params):
        flat, _ = ravel_pytree(params)
        return FlatAdamWState(count=jnp.zeros((), jnp.int32),
                              m=jnp.zeros_like(flat),
                              v=jnp.zeros_like(flat),
                              gnorm=jnp.zeros((), jnp.float32))

    def update(grads, state, params):
        g, unravel = ravel_pytree(grads)
        g = g.astype(jnp.float32)
        gnorm = jnp.sqrt(jnp.sum(g * g))
        if clip_norm and clip_norm > 0:
            g = g * (clip_norm / jnp.maximum(gnorm, clip_norm))
        c = state.count + 1
        m = state.m * b1 + g * (1.0 - b1)
        v = state.v * b2 + g * g * (1.0 - b2)
        cf = c.astype(jnp.float32)
        mhat = m / (1.0 - b1 ** cf)
        vhat = v / (1.0 - b2 ** cf)
        u = mhat / (jnp.sqrt(vhat) + eps)
        # weight decay + LR move to a PER-LEAF epilogue (r4, ROADMAP #18
        # concat chain): the base LR is a scalar per leaf and cosine_lr is
        # elementwise in it, so -lr*(u + wd*p) per leaf is bitwise equal
        # to the former flat form while skipping the params ravel (a
        # param-sized concat copy) and the per-element LR constant vector
        u_tree = unravel(u)

        def leaf_update(u_leaf, p_leaf, base):
            if use_cosine:
                from pcfm.train.state import cosine_lr
                lr = cosine_lr(state.count, total_steps, base, min_lr,
                               warmup_steps)
            else:
                lr = jnp.float32(base)
            uu = u_leaf.astype(jnp.float32)
            if weight_decay:
                uu = uu + weight_decay * p_leaf.astype(jnp.float32)
            return (-lr * uu).astype(u_leaf.dtype)

        updates = jax.tree_util.tree_map(leaf_update, u_tree, params,
                                         base_lr_tree_fn(params))
        return updates, FlatAdamWState(count=c, m=m, v=v, gnorm=gnorm)

    return optax.GradientTransformation(init, update)


def opt_grad_norm(opt_state) -> jax.Array | None:
    """The flat optimizer's stored global grad norm (None for optax
    chains without one)."""
    return getattr(opt_state, "gnorm", None)
