"""Jitted sampling: lax.scan integrators + priors + generation pipeline."""
from pcfm.sample.integrators import (SAMPLERS, dopri5_sample, euler_sample,
                                     get_sampler, heun_sample, make_guided,
                                     midpoint_euler_sample, rk4_sample)
from pcfm.sample.priors import make_latent_prior, make_pf_prior

__all__ = [
    "SAMPLERS", "dopri5_sample", "euler_sample", "get_sampler", "heun_sample", "make_guided",
    "midpoint_euler_sample", "rk4_sample", "make_latent_prior",
    "make_pf_prior",
]
