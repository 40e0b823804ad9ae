"""Flat fused AdamW (pcfm/train/flat_opt.py) vs the leaf-wise optax
chain: numerically equal updates, schedule and clip included."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcfm.config import Config
from pcfm.train.state import init_state, make_optimizer
from pcfm.train.step import make_train_step


CFG = dict(dataset_type="synthetic", pf_backbone="mlp", latent_dim=16,
           enc_width=16, enc_depth=4, pf_width=32, pf_depth=3,
           pf_emb_dim=16, lf_width=32, lf_depth=3, lf_emb_dim=16,
           warmup_steps=3, amp=False, batch_size=4,
           tr_max_sample_points=32, te_max_sample_points=32,
           num_workers=0, geom_warmup_epochs=0, epochs=2)


def _run_steps(flat: bool, n_steps: int = 5):
    cfg = Config(flat_optimizer=flat, **CFG)
    cfg = cfg.replace(cond_dim=1, has_rgb=True)
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0),
                                   total_steps=10)
    step = make_train_step(bundle, tx, donate=False)
    key = jax.random.PRNGKey(1)
    batch = {"pts": jax.random.normal(key, (4, 32, 3)),
             "rgb": jax.random.uniform(key, (4, 32, 3)),
             "cond": jax.random.normal(key, (4, 1))}
    c_on, d_p = jnp.float32(1.0), jnp.float32(0.0)
    ms = []
    for i in range(n_steps):
        state, m = step(state, batch, jax.random.fold_in(key, i), c_on,
                        d_p)
        ms.append(m)
    return state, ms


def test_flat_matches_optax_chain():
    s_flat, m_flat = _run_steps(True)
    s_ref, m_ref = _run_steps(False)
    # identical losses (same fwd) and identical grad-norm metric
    for a, b in zip(m_flat, m_ref):
        np.testing.assert_allclose(float(a["loss"]), float(b["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(a["grad_norm"]),
                                   float(b["grad_norm"]), rtol=1e-5)
    # parameters after 5 steps agree to float32 roundoff
    fa = jax.tree_util.tree_leaves(s_flat.params)
    fb = jax.tree_util.tree_leaves(s_ref.params)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_flat_clip_engages():
    """With a tiny clip norm the update magnitude is bounded and gnorm is
    reported unclipped."""
    cfg = Config(flat_optimizer=True, grad_clip_norm=1e-3, cond_dim=0,
                 **{**CFG, "warmup_steps": 0})
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 10)
    step = make_train_step(bundle, tx, donate=False)
    key = jax.random.PRNGKey(1)
    batch = {"pts": 100.0 * jax.random.normal(key, (4, 32, 3))}
    state2, m = step(state, batch, key, jnp.float32(0.0), jnp.float32(0.0))
    assert float(m["grad_norm"]) > 1e-3   # raw norm, pre-clip
    # clipped update: params move by at most ~lr * sqrt(n_params)
    delta = jax.tree_util.tree_map(lambda a, b: jnp.max(jnp.abs(a - b)),
                                   state.params, state2.params)
    assert max(float(x) for x in jax.tree_util.tree_leaves(delta)) < 1.0


def test_flat_optimizer_trains(tmp_path):
    from pcfm.train.loop import train
    cfg = Config(flat_optimizer=True, save_every=2, out_dir=str(tmp_path),
                 vis_count=1, sample_steps=2, **CFG)
    out = train(cfg, verbose=False)
    assert np.isfinite(out["loss"])
