"""Jitted ODE integrators for flow sampling.

The reference integrates with per-step Python loops launching 2*steps
network forwards (train.py:332-341, 384-415 Heun; models.py:277-290 Euler
midpoint).  Here the whole trajectory is one ``lax.scan`` under jit, so
sampling stays on-device end to end.

``guided_velocity`` implements classifier-free guidance
``v_c + s (v_c - v_u)``.  Both reference unconditional branches (mask-drop
for VelocityNet, models.py:145-153; zero-cond for HybridMLP,
models.py:686-694) reduce to a zeroed condition, so the two forwards are
fused into ONE batched 2B call — twice the GEMM rows, better MXU
utilization than two sequential B calls.

Samplers: euler, midpoint (the reference euler_sample's t=(i+0.5)dt grid),
heun (the reference default, NFE = 2*steps), rk4 (NFE = 4*steps).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

VelocityFn = Callable[[jax.Array, jax.Array, Optional[jax.Array]], jax.Array]


def make_guided(vf: VelocityFn, cond: Optional[jax.Array],
                guidance_scale: float) -> Callable[[jax.Array, jax.Array],
                                                   jax.Array]:
    """Wrap a velocity fn into v(x, t) with optional CFG.

    vf(x, t, cond) must accept cond=None or a (B, C) array; the
    unconditional branch passes zeros_like(cond).
    """
    if guidance_scale <= 0.0 or cond is None:
        return lambda x, t: vf(x, t, cond)

    def guided(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        c2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        v2 = vf(x2, t2, c2)
        v_c, v_u = jnp.split(v2, 2, axis=0)
        return v_c + guidance_scale * (v_c - v_u)

    return guided


def _scan_steps(step_fn, x0, steps: int):
    ks = jnp.arange(steps, dtype=jnp.float32)
    x, _ = jax.lax.scan(step_fn, x0, ks)
    return x


def euler_sample(vf: VelocityFn, x0: jax.Array, steps: int,
                 cond: Optional[jax.Array] = None,
                 guidance_scale: float = 0.0) -> jax.Array:
    """Plain Euler on t = k/steps."""
    v = make_guided(vf, cond, guidance_scale)
    dt = 1.0 / steps
    b = x0.shape[0]

    def step(x, k):
        t = jnp.full((b,), k * dt, x0.dtype)
        return x + v(x, t) * dt, None

    return _scan_steps(step, x0, steps)


def midpoint_euler_sample(vf: VelocityFn, x0: jax.Array, steps: int,
                          cond: Optional[jax.Array] = None,
                          guidance_scale: float = 0.0) -> jax.Array:
    """Euler on the midpoint grid t = (k+0.5)/steps — the reference
    ``euler_sample`` (models.py:277-290)."""
    v = make_guided(vf, cond, guidance_scale)
    dt = 1.0 / steps
    b = x0.shape[0]

    def step(x, k):
        t = jnp.full((b,), (k + 0.5) * dt, x0.dtype)
        return x + v(x, t) * dt, None

    return _scan_steps(step, x0, steps)


def heun_sample(vf: VelocityFn, x0: jax.Array, steps: int,
                cond: Optional[jax.Array] = None,
                guidance_scale: float = 0.0) -> jax.Array:
    """Heun (RK2) predictor-corrector on t0=k/steps -> t1=(k+1)/steps —
    the reference sampler (train.py:332-341)."""
    v = make_guided(vf, cond, guidance_scale)
    dt = 1.0 / steps
    b = x0.shape[0]

    def step(x, k):
        t0 = jnp.full((b,), k * dt, x0.dtype)
        v1 = v(x, t0)
        x_hat = x + v1 * dt
        t1 = jnp.full((b,), (k + 1) * dt, x0.dtype)
        v2 = v(x_hat, t1)
        return x + 0.5 * dt * (v1 + v2), None

    return _scan_steps(step, x0, steps)


def rk4_sample(vf: VelocityFn, x0: jax.Array, steps: int,
               cond: Optional[jax.Array] = None,
               guidance_scale: float = 0.0) -> jax.Array:
    """Classic RK4 fixed-grid integrator (NFE = 4*steps)."""
    v = make_guided(vf, cond, guidance_scale)
    dt = 1.0 / steps
    b = x0.shape[0]

    def step(x, k):
        t = jnp.full((b,), k * dt, x0.dtype)
        k1 = v(x, t)
        k2 = v(x + 0.5 * dt * k1, t + 0.5 * dt)
        k3 = v(x + 0.5 * dt * k2, t + 0.5 * dt)
        k4 = v(x + dt * k3, t + dt)
        return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    return _scan_steps(step, x0, steps)


SAMPLERS = {
    "euler": euler_sample,
    "midpoint": midpoint_euler_sample,
    "heun": heun_sample,
    "rk4": rk4_sample,
}


def get_sampler(name: str):
    if name not in SAMPLERS:
        raise ValueError(f"unknown sampler '{name}' "
                         f"(choices: {sorted(SAMPLERS)})")
    return SAMPLERS[name]
