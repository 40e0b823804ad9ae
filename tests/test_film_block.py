"""Fused FiLM residual-block kernel vs the unfused formulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcfm.ops.pallas.film_block import film_block, film_block_reference


def _inputs(key, b=2, n=300, c=256, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    h = jax.random.normal(ks[0], (b, n, c), dtype) * 0.7
    s = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
    t = 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
    gamma = 0.2 * jax.random.normal(ks[3], (b, c), jnp.float32)
    beta = 0.2 * jax.random.normal(ks[4], (b, c), jnp.float32)
    w = jax.random.normal(ks[5], (c, c), jnp.float32) / np.sqrt(c)
    bias = 0.1 * jax.random.normal(ks[6], (c,), jnp.float32)
    return h, s, t, gamma, beta, w, bias


def test_forward_matches_reference():
    args = _inputs(jax.random.PRNGKey(0))
    y = film_block(*args, True)
    y_ref = film_block_reference(*args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-2)


def test_forward_bf16():
    args = _inputs(jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    y = film_block(*args, True)
    assert y.dtype == jnp.bfloat16
    y_ref = film_block_reference(*args)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=6e-2, atol=6e-2)


def test_unaligned_n_padding_inert():
    # n not a multiple of the row tile: padded rows must not leak into
    # outputs or gradients
    args = _inputs(jax.random.PRNGKey(2), n=200)
    y = film_block(*args, True)
    y_ref = film_block_reference(*args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("n", [256, 200])
def test_gradients_match_reference(n):
    args = _inputs(jax.random.PRNGKey(3), b=2, n=n, c=256)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(film_block(*a, True)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(film_block_reference(*a)))

    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["dh", "ds", "dt", "dgamma", "dbeta", "dw", "db"]
    for name, gf, gr in zip(names, g_fused, g_ref):
        gf, gr = np.asarray(gf, np.float64), np.asarray(gr, np.float64)
        scale = max(1e-6, np.abs(gr).max())
        np.testing.assert_allclose(gf / scale, gr / scale, atol=3e-2,
                                   err_msg=name)


def test_velocitynet_fused_param_tree_and_forward():
    # fused path must create the IDENTICAL param tree and match the
    # unfused forward (interpret-mode kernel on CPU)
    from pcfm.models.velocity import VelocityNet
    key = jax.random.PRNGKey(0)
    kw = dict(cond_dim=4, width=128, depth=3, emb_dim=32)
    m_ref = VelocityNet(fused_trunk="off", **kw)
    m_fused = VelocityNet(fused_trunk="on", **kw)
    x = jax.random.normal(key, (2, 64, 3))
    t = jax.random.uniform(key, (2,))
    cond = jax.random.normal(key, (2, 4))
    v_ref = m_ref.init(key, x, t, cond)
    v_fused = m_fused.init(key, x, t, cond)
    ref_tree = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                      v_ref)
    fused_tree = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                        v_fused)
    assert ref_tree == fused_tree
    y_ref = m_ref.apply(v_ref, x, t, cond)
    y_fused = m_fused.apply(v_ref, x, t, cond)   # same params both paths
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)


def test_velocitynet_fused_grads_match():
    from pcfm.models.velocity import VelocityNet
    key = jax.random.PRNGKey(1)
    kw = dict(cond_dim=0, width=128, depth=3, emb_dim=32)
    m_ref = VelocityNet(fused_trunk="off", **kw)
    m_fused = VelocityNet(fused_trunk="on", **kw)
    x = jax.random.normal(key, (2, 40, 3))
    t = jax.random.uniform(key, (2,))
    variables = m_ref.init(key, x, t, None)

    def loss(m, v):
        return jnp.mean(m.apply(v, x, t, None) ** 2)

    g_ref = jax.grad(lambda v: loss(m_ref, v))(variables)
    g_fused = jax.grad(lambda v: loss(m_fused, v))(variables)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    for a, b in zip(flat_r, flat_f):
        scale = max(1e-6, float(jnp.abs(a).max()))
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=2e-2)
