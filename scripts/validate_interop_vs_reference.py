#!/usr/bin/env python
"""One-off dev-env validation: pcfm.interop vs the ACTUAL reference code.

Instantiates the reference's own ``models.py`` classes (VelocityNet,
ShapeEncoder, ConditionalLatentVelocityNet — the mlp-side modules, which
are pure torch) from ``/root/reference``, saves a checkpoint in the
reference trainer's exact format (train.py:682-708), imports it with
``pcfm.interop`` and checks forward parity of the imported jax state
against the reference forward pass.

The hybrid side cannot be instantiated off-GPU (importing
``modules.pvconv`` JIT-builds CUDA), so ``modules`` is stubbed with inert
placeholders — VelocityNet and friends never touch them.  Requires the
reference checkout; NOT part of the test suite (tests/test_interop.py
covers both backbones via the torch mirrors).
"""
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

REF = "/root/reference"

# stub the CUDA-building pvcnn modules before importing reference models
for name in ("modules", "modules.pvconv", "modules.shared_mlp"):
    m = types.ModuleType(name)
    sys.modules[name] = m
sys.modules["modules.pvconv"].PVConv = object
sys.modules["modules.shared_mlp"].SharedMLP = object

sys.path.insert(0, REF)
import models as ref_models  # noqa: E402  (the reference's models.py)

torch.manual_seed(0)
latent, cond_dim, width, depth, emb, pd = 32, 2, 64, 4, 32, 6
pf_cond = latent + cond_dim

enc = ref_models.ShapeEncoder(latent_dim=latent, width=32, depth=4,
                              in_channels=6).eval()
pf = ref_models.VelocityNet(cond_dim=pf_cond, width=width, depth=depth,
                            emb_dim=emb, point_dim=pd).eval()
lf = ref_models.ConditionalLatentVelocityNet(
    latent_dim=latent, cond_dim=0, width=48, depth=3, emb_dim=24).eval()

args = dict(pf_backbone="mlp", latent_dim=latent, enc_width=32, enc_depth=4,
            pf_width=width, pf_depth=depth, pf_emb_dim=emb, lf_width=48,
            lf_depth=3, lf_emb_dim=24, amp=False, use_bf16=False,
            has_rgb=True, cond_dim=cond_dim, use_rgb_in_latent=True,
            pointflow_rgb=True)
ckpt = {"epoch": 5, "global_step": 99, "encoder": enc.state_dict(),
        "pf": pf.state_dict(), "lf": lf.state_dict(),
        "ema_pf": {k: v.clone() for k, v in pf.state_dict().items()},
        "ema_lf": {k: v.clone() for k, v in lf.state_dict().items()},
        "args": args, "cond_dim": cond_dim}

from pcfm import interop  # noqa: E402

cfg = interop.config_from_reference_args(args, cond_dim=cond_dim)
bundle, state, _ = interop.state_from_reference_ckpt(ckpt, cfg)

rng = np.random.RandomState(0)
x = rng.randn(3, 21, pd).astype(np.float32)
t = rng.rand(3).astype(np.float32)
c = rng.randn(3, pf_cond).astype(np.float32)
pts = rng.randn(3, 40, 6).astype(np.float32)
y = rng.randn(3, latent).astype(np.float32)

with torch.no_grad():
    want_v = pf(torch.from_numpy(x), torch.from_numpy(t),
                torch.from_numpy(c)).numpy()
    want_g = pf.guided_velocity(torch.from_numpy(x), torch.from_numpy(t),
                                torch.from_numpy(c),
                                guidance_scale=1.5).numpy()
    want_z, _ = enc(torch.from_numpy(pts))
    want_l = lf(torch.from_numpy(y), torch.from_numpy(t), None).numpy()

got_v, _ = bundle.apply_pf(state.params["pf"], {}, jnp.asarray(x),
                           jnp.asarray(t), jnp.asarray(c), None,
                           train=False)
from pcfm.sample.integrators import make_guided  # noqa: E402
vel = bundle.pf_velocity_fn(state.params["pf"], {})
got_g = make_guided(vel, jnp.asarray(c), 1.5)(jnp.asarray(x),
                                              jnp.asarray(t))
got_z, _, _ = bundle.apply_enc(state.params["enc"], {}, jnp.asarray(pts),
                               train=False)
got_l = bundle.apply_lf(state.params["lf"], jnp.asarray(y), jnp.asarray(t))

for name, got, want in (("pf", got_v, want_v), ("pf+cfg", got_g, want_g),
                        ("enc", got_z, want_z.numpy()),
                        ("lf", got_l, want_l)):
    err = float(np.abs(np.asarray(got) - want).max())
    status = "OK" if err < 2e-5 else "FAIL"
    print(f"[interop-vs-reference] {name:7s} max|Δ| = {err:.3e}  {status}")
    assert err < 2e-5, name
print("[interop-vs-reference] imported state reproduces the reference "
      "forward pass (mlp-side modules, actual reference code)")

# ---- ctx_norm='batch'/'syncbn' FiLM mapping vs the ACTUAL reference
# _FiLM1d (models.py:313-346; pure torch, no CUDA needed).  The full
# hybrid batch-norm import path is covered by the mirror-based
# tests/test_interop.py::test_import_hybrid_batchnorm_forward_parity;
# this checks the norm/bn running-stat mapping against reference code.
from pcfm.interop.torch_ckpt import film1d_from_sd  # noqa: E402
from pcfm.nn.film import FiLM1d  # noqa: E402

for norm_type in ("batch", "syncbn"):
    torch.manual_seed(1)
    C, E = 24, 16
    film_t = ref_models._FiLM1d(C, E, norm_type=norm_type).eval()
    with torch.no_grad():
        film_t.affine.weight.normal_(0, 0.05)
        film_t.affine.bias.normal_(0, 0.05)
        film_t.norm.weight.normal_(1.0, 0.1)
        film_t.norm.bias.normal_(0, 0.1)
        film_t.norm.running_mean.normal_(0, 0.3)
        film_t.norm.running_var.uniform_(0.5, 1.5)
    # film1d_from_sd expects reference-checkpoint key prefixes
    sd_pref = {f"f.{k}": v for k, v in film_t.state_dict().items()}
    p_map, s_map = film1d_from_sd(sd_pref, "f")

    xb = rng.randn(3, C, 17).astype(np.float32)        # torch layout (B,C,N)
    eb = rng.randn(3, E).astype(np.float32)
    with torch.no_grad():
        want_f = film_t(torch.from_numpy(xb), torch.from_numpy(eb)).numpy()
    mod = FiLM1d(channels=C, norm_type=norm_type)
    got_f = mod.apply({"params": p_map, "batch_stats": s_map},
                      jnp.asarray(xb.transpose(0, 2, 1)), jnp.asarray(eb),
                      train=False)
    err = float(np.abs(np.asarray(got_f).transpose(0, 2, 1) - want_f).max())
    status = "OK" if err < 2e-5 else "FAIL"
    print(f"[interop-vs-reference] _FiLM1d({norm_type}) max|Δ| = "
          f"{err:.3e}  {status}")
    assert err < 2e-5, norm_type
print("[interop-vs-reference] batch/syncbn FiLM running-stat mapping "
      "matches the reference _FiLM1d forward")
