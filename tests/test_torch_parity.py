"""Exact forward parity vs torch mirrors of the reference architectures.

Weights are transplanted torch->flax; outputs must agree to fp32 tolerance.
This pins the architectures (layer order, residual/FiLM placement,
embedding formula, CFG mask semantics) to the reference definitions.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pcfm import models  # noqa: E402
from tests import torch_mirror as tm  # noqa: E402

ATOL = 2e-5


def test_velocity_net_forward_parity():
    torch.manual_seed(0)
    cond_dim, width, depth, emb, pd = 10, 64, 4, 32, 6
    net_t = tm.VelocityNetT(cond_dim, width, depth, emb, pd).eval()
    params = {"params": tm.velocity_net_params(net_t, depth)}
    net_j = models.VelocityNet(cond_dim=cond_dim, width=width, depth=depth,
                               emb_dim=emb, point_dim=pd)

    rng = np.random.RandomState(0)
    x = rng.randn(3, 17, pd).astype(np.float32)
    t = rng.rand(3).astype(np.float32)
    c = rng.randn(3, cond_dim).astype(np.float32)

    with torch.no_grad():
        want = net_t(torch.from_numpy(x), torch.from_numpy(t),
                     torch.from_numpy(c)).numpy()
    got = np.asarray(net_j.apply(params, jnp.asarray(x), jnp.asarray(t),
                                 jnp.asarray(c)))
    np.testing.assert_allclose(got, want, atol=ATOL)

    # CFG mask semantics parity (mask=1 -> dropped)
    mask = np.array([[1.0], [0.0], [1.0]], np.float32)
    with torch.no_grad():
        want_m = net_t(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(c),
                       cond_drop_mask=torch.from_numpy(mask)).numpy()
    got_m = np.asarray(net_j.apply(params, jnp.asarray(x), jnp.asarray(t),
                                   jnp.asarray(c),
                                   cond_drop_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got_m, want_m, atol=ATOL)


def test_velocity_net_no_cond_parity():
    torch.manual_seed(1)
    net_t = tm.VelocityNetT(0, 32, 3, 16, 3).eval()
    params = {"params": tm.velocity_net_params(net_t, 3)}
    net_j = models.VelocityNet(cond_dim=0, width=32, depth=3, emb_dim=16,
                               point_dim=3)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 9, 3).astype(np.float32)
    t = rng.rand(2).astype(np.float32)
    with torch.no_grad():
        want = net_t(torch.from_numpy(x), torch.from_numpy(t), None).numpy()
    got = np.asarray(net_j.apply(params, jnp.asarray(x), jnp.asarray(t),
                                 None))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_shape_encoder_forward_parity():
    torch.manual_seed(2)
    latent, width, depth, in_ch = 24, 32, 5, 6
    net_t = tm.ShapeEncoderT(latent, width, depth, in_ch).eval()
    params = {"params": tm.shape_encoder_params(net_t, depth)}
    net_j = models.ShapeEncoder(latent_dim=latent, width=width, depth=depth,
                                in_channels=in_ch)
    rng = np.random.RandomState(2)
    x = rng.randn(4, 33, in_ch).astype(np.float32)
    with torch.no_grad():
        want_z, want_h = net_t(torch.from_numpy(x))
    got_z, got_h = net_j.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_z), want_z.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_h), want_h.numpy(), atol=ATOL)


def test_latent_net_forward_parity():
    torch.manual_seed(3)
    latent, width, depth, emb = 16, 48, 4, 32
    net_t = tm.LatentVelocityNetT(latent, 0, width, depth, emb).eval()
    params = {"params": tm.latent_net_params(net_t, depth)}
    net_j = models.ConditionalLatentVelocityNet(
        latent_dim=latent, cond_dim=0, width=width, depth=depth,
        emb_dim=emb)
    rng = np.random.RandomState(3)
    y = rng.randn(5, latent).astype(np.float32)
    t = rng.rand(5).astype(np.float32)
    with torch.no_grad():
        want = net_t(torch.from_numpy(y), torch.from_numpy(t), None).numpy()
    got = np.asarray(net_j.apply(params, jnp.asarray(y), jnp.asarray(t),
                                 None))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_timestep_embedding_parity():
    t = np.array([0.0, 0.123, 0.9, 1.0], np.float32)
    want = tm.timestep_embedding_t(torch.from_numpy(t), 32).numpy()
    got = np.asarray(models.timestep_embedding(jnp.asarray(t), 32))
    np.testing.assert_allclose(got, want, atol=1e-6)
