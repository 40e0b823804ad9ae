"""Model-zoo shape/behavior tests (encoder, velocity nets, context, hybrid,
latent flow, adversary)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcfm import models


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_timestep_embedding_matches_formula():
    t = jnp.asarray([0.0, 0.5, 1.0])
    emb = models.timestep_embedding(t, 8)
    assert emb.shape == (3, 8)
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    want = np.concatenate([np.cos(0.5 * freqs), np.sin(0.5 * freqs)])
    np.testing.assert_allclose(np.asarray(emb[1]), want, atol=1e-6)


def test_velocity_net_forward_and_cfg(key):
    b, n, cdim = 2, 16, 10
    net = models.VelocityNet(cond_dim=cdim, width=64, depth=3, emb_dim=32,
                             point_dim=3)
    x = jax.random.normal(key, (b, n, 3))
    t = jnp.full((b,), 0.3)
    cond = jax.random.normal(key, (b, cdim))
    params = net.init(key, x, t, cond)
    v = net.apply(params, x, t, cond)
    assert v.shape == (b, n, 3)
    # mask=1 must equal cond=0 (the CFG unconditional branch identity)
    mask = jnp.ones((b, 1))
    v_mask = net.apply(params, x, t, cond, cond_drop_mask=mask)
    v_zero = net.apply(params, x, t, jnp.zeros_like(cond))
    np.testing.assert_allclose(np.asarray(v_mask), np.asarray(v_zero),
                               atol=1e-6)


def test_velocity_net_6d(key):
    net = models.VelocityNet(cond_dim=0, width=32, depth=2, emb_dim=16,
                             point_dim=6)
    x = jax.random.normal(key, (2, 8, 6))
    t = jnp.zeros((2,))
    params = net.init(key, x, t, None)
    assert net.apply(params, x, t, None).shape == (2, 8, 6)


def test_shape_encoder_permutation_invariant(key):
    enc = models.ShapeEncoder(latent_dim=32, width=16, depth=4, in_channels=3)
    x = jax.random.normal(key, (2, 20, 3))
    params = enc.init(key, x)
    z1, h = enc.apply(params, x)
    assert z1.shape == (2, 32) and h.shape == (2, 20, 16)
    perm = jax.random.permutation(key, 20)
    z2, _ = enc.apply(params, x[:, perm])
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)


def test_latent_velocity_net(key):
    lf = models.ConditionalLatentVelocityNet(latent_dim=16, cond_dim=0,
                                             width=32, depth=3, emb_dim=16)
    y = jax.random.normal(key, (4, 16))
    t = jnp.full((4,), 0.7)
    params = lf.init(key, y, t, None)
    v = lf.apply(params, y, t, None)
    assert v.shape == (4, 16)


def test_context_net_zero_init_and_t_gate(key):
    b, n = 2, 64
    ctx_net = models.ContextNet(in_point_dim=3, cond_dim=4, emb_dim=16,
                                ctx_dim=8, stage_channels=(16,),
                                stage_blocks=(1,), stage_res=(4,),
                                with_se=True, with_global=True,
                                use_t_gate=True, t_gate_k=10.0,
                                t_gate_tau=0.4)
    x = jax.random.normal(key, (b, n, 3))
    t = jnp.full((b,), 0.0)
    cond = jax.random.normal(key, (b, 4))
    variables = ctx_net.init(key, x, t, cond, train=False)
    ctx, _ = ctx_net.apply(variables, x, t, cond, train=True,
                           mutable=["batch_stats"])
    assert ctx.shape == (b, n, 8)
    # at init, ctx_pv == 0 (zero-init head), so ctx = (1-alpha) * ctx_glb,
    # which is constant across points
    spread = jnp.max(jnp.std(ctx, axis=1))
    assert float(spread) < 1e-6


def test_hybrid_mlp_forward(key):
    b, n = 2, 32
    pf = models.HybridMLP(cond_dim=6, point_dim=6, ctx_dim=8, ctx_emb_dim=16,
                          stage_channels=(16, 16), stage_blocks=(1, 1),
                          stage_res=(8, 4), pf_width=32, pf_depth=2,
                          pf_emb_dim=16)
    x = jax.random.normal(key, (b, n, 6))
    t = jnp.full((b,), 0.5)
    cond = jax.random.normal(key, (b, 6))
    variables = pf.init(key, x, t, cond, train=False)
    v, updates = pf.apply(variables, x, t, cond, train=True,
                          mutable=["batch_stats"])
    assert v.shape == (b, n, 6)
    assert "batch_stats" in updates
    # eval mode doesn't need mutable
    v2 = pf.apply(variables, x, t, cond, train=False)
    assert v2.shape == (b, n, 6)


def test_hybrid_mask_equals_zero_cond(key):
    """mask-drop and zero-cond unconditional branches coincide (so one CFG
    implementation serves both backbones)."""
    b, n = 2, 16
    pf = models.HybridMLP(cond_dim=4, point_dim=3, ctx_dim=4, ctx_emb_dim=8,
                          stage_channels=(8,), stage_blocks=(1,),
                          stage_res=(4,), pf_width=16, pf_depth=2,
                          pf_emb_dim=8)
    key1, key2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(key1, (b, n, 3))
    t = jnp.full((b,), 0.9)
    cond = jax.random.normal(key2, (b, 4))
    variables = pf.init(key1, x, t, cond, train=False)
    v_mask = pf.apply(variables, x, t, cond,
                      cond_drop_mask=jnp.ones((b, 1)), train=False)
    v_zero = pf.apply(variables, x, t, jnp.zeros_like(cond), train=False)
    np.testing.assert_allclose(np.asarray(v_mask), np.asarray(v_zero),
                               atol=1e-5)


def test_grad_reverse():
    g = jax.grad(lambda x: jnp.sum(models.grad_reverse(x, 0.5) ** 2))(
        jnp.ones(3))
    np.testing.assert_allclose(np.asarray(g), -0.5 * 2 * np.ones(3),
                               atol=1e-6)


def test_cond_adversary(key):
    adv = models.CondAdversary(cond_dim=5, width=16, depth=3)
    z = jax.random.normal(key, (3, 8))
    params = adv.init(key, z)
    assert adv.apply(params, z).shape == (3, 5)


def test_velocity_bf16_compute(key):
    net = models.VelocityNet(cond_dim=0, width=64, depth=3, emb_dim=32,
                             point_dim=3, dtype=jnp.bfloat16)
    x = jax.random.normal(key, (2, 8, 3))
    t = jnp.zeros((2,))
    params = net.init(key, x, t, None)
    v = net.apply(params, x, t, None)
    assert v.dtype == jnp.float32  # output cast back to fp32
    # params stay fp32 masters
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32


def test_film_every_turbo_trunk():
    """Opt-in turbo trunk (Config pf_film_every): FiLM only on every k-th
    block — param tree drops the skipped film_i, forward runs, and k=1
    reproduces the reference-parity tree."""
    import numpy as np

    from pcfm.config import Config
    from pcfm.train.state import init_state
    from pcfm.train.step import make_train_step

    kw = dict(latent_dim=8, enc_width=8, enc_depth=4, pf_width=32,
              pf_depth=5, pf_emb_dim=8, lf_width=16, lf_depth=3,
              lf_emb_dim=8, amp=False, cond_dim=1, batch_size=2,
              tr_max_sample_points=16, warmup_steps=0)
    cfg = Config(pf_backbone="mlp", pf_film_every=2, **kw)
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 10)
    films = sorted(k for k in state.params["pf"] if k.startswith("film"))
    assert films == ["film_0", "film_2"]
    blocks = sorted(k for k in state.params["pf"] if k.startswith("block"))
    assert blocks == [f"block_{i}" for i in range(4)]   # Dense stack intact

    step = make_train_step(bundle, tx, donate=False)
    batch = {"pts": jnp.asarray(np.random.RandomState(0)
                                .randn(2, 16, 3), jnp.float32),
             "cond": jnp.ones((2, 1), jnp.float32)}
    state, m = step(state, batch, jax.random.PRNGKey(1), jnp.float32(0.0),
                    jnp.float32(0.0))
    assert np.isfinite(float(m["loss"]))

    cfg1 = Config(pf_backbone="mlp", pf_film_every=1, **kw)
    _, state1, _ = init_state(cfg1, jax.random.PRNGKey(0), 10)
    films1 = sorted(k for k in state1.params["pf"] if k.startswith("film"))
    assert films1 == [f"film_{i}" for i in range(4)]
