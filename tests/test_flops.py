"""Analytic model-FLOP counter (pcfm/utils/flops.py) + bench wiring."""
import jax
import jax.numpy as jnp
import numpy as np

from pcfm.config import Config
from pcfm.utils.flops import V5E_BF16_PEAK, count_matmul_flops, mfu


def test_dot_flops_exact():
    f = lambda x, w: x @ w
    n = count_matmul_flops(f, jnp.zeros((8, 100, 32)), jnp.zeros((32, 64)))
    assert n == 2 * 8 * 100 * 32 * 64


def test_conv3d_flops_exact():
    import flax.linen as nn
    conv = nn.Conv(16, (3, 3, 3), padding="SAME")
    x = jnp.zeros((2, 4, 4, 4, 8))
    p = conv.init(jax.random.PRNGKey(0), x)
    n = count_matmul_flops(lambda p, x: conv.apply(p, x), p, x)
    assert n == 2 * (2 * 4 * 4 * 4) * 16 * 8 * 27


def test_depthwise_conv_flops_exact():
    """Regression (review r3): the conv kernel operand's in-feature dim is
    already C_in/groups — dividing by groups again undercounted
    grouped/depthwise convs by a groups factor."""
    import flax.linen as nn
    conv = nn.Conv(8, (3, 3), padding="SAME", feature_group_count=8)
    x = jnp.zeros((1, 4, 4, 8))
    p = conv.init(jax.random.PRNGKey(0), x)
    n = count_matmul_flops(lambda p, x: conv.apply(p, x), p, x)
    assert n == 2 * (1 * 4 * 4 * 8) * 1 * 9    # out_elems * C_in/g * k


def test_remat_body_counted():
    """Regression (review r3): remat2 carries an open Jaxpr, which the
    sub-jaxpr walk skipped — dots under jax.checkpoint counted as zero."""
    w = jnp.zeros((32, 32))

    def f(x, w):
        return jax.checkpoint(lambda x: x @ w)(x)

    n = count_matmul_flops(f, jnp.zeros((8, 32)), w)
    assert n == 2 * 8 * 32 * 32


def test_scan_multiplies_trip_count():
    def scanned(x):
        def body(c, _):
            return c @ jnp.ones((32, 32)), None
        y, _ = jax.lax.scan(body, x, None, length=5)
        return y
    n = count_matmul_flops(scanned, jnp.zeros((8, 32)))
    assert n == 5 * 2 * 8 * 32 * 32


def test_train_step_flops_vs_manual_trunk_bound():
    """The traced step count must at least cover the analytically-known
    trunk GEMMs (fwd ~1x + bwd ~2x) and stay within a sane envelope."""
    from pcfm.train.state import init_state
    from pcfm.train.step import make_train_step
    b, n = 2, 64
    cfg = Config(pf_backbone="mlp", latent_dim=16, enc_width=16,
                 enc_depth=4, pf_width=32, pf_depth=3, pf_emb_dim=16,
                 lf_width=32, lf_depth=3, lf_emb_dim=16, warmup_steps=0,
                 amp=False, has_rgb=False, cond_dim=0, batch_size=b,
                 tr_max_sample_points=n)
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 10)
    step = make_train_step(bundle, tx, donate=False)
    batch = {"pts": jnp.zeros((b, n, 3))}
    fl = count_matmul_flops(step, state, batch, jax.random.PRNGKey(1),
                            jnp.float32(1.0), jnp.float32(0.1))
    # pf trunk fwd: input (3+16->32) + 2 residual blocks (32->32) + out
    trunk_fwd = 2 * b * n * (19 * 32 + 2 * 32 * 32 + 32 * 3)
    assert fl >= 3 * trunk_fwd          # fwd + ~2x bwd at minimum
    assert fl < 400 * trunk_fwd         # and not wildly inflated


def test_bench_step_smoke_tiny():
    """bench.bench_step returns (time, flops) on CPU with tiny shapes."""
    import bench
    cfg = Config(pf_backbone="mlp", latent_dim=16, enc_width=16,
                 enc_depth=4, pf_width=32, pf_depth=3, pf_emb_dim=16,
                 lf_width=32, lf_depth=3, lf_emb_dim=16, warmup_steps=0,
                 amp=False, has_rgb=True, cond_dim=1, pointflow_rgb=True,
                 use_rgb_in_latent=True, batch_size=2,
                 tr_max_sample_points=32)
    t, fl, hbm = bench.bench_step(cfg, 2, 32, iters=2, warmup=1)
    assert t > 0 and fl > 0
    assert hbm is None or hbm > 0
    assert 0 < mfu(fl, t, peak=V5E_BF16_PEAK) < 1


def test_mfu_guards():
    assert np.isnan(mfu(100, 0.0))
    assert mfu(197e12, 1.0) == 1.0
