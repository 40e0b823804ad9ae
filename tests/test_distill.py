"""Progressive distillation (pcfm/distill/): loss decreases within a
phase, the distilled student beats the undistilled field at matching the
teacher's fine-grained jump, and the CLI round-trips through the
sample CLI."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcfm.config import Config
from pcfm.distill.progressive import (_teacher_two_heun, distill_pf,
                                      make_distill_step)
from pcfm.train.loop import train
from pcfm.train.state import init_state


CFG = dict(dataset_type="synthetic", pf_backbone="mlp", latent_dim=16,
           enc_width=16, enc_depth=4, pf_width=32, pf_depth=3,
           pf_emb_dim=16, lf_width=32, lf_depth=3, lf_emb_dim=16,
           warmup_steps=0, amp=False, batch_size=4,
           tr_max_sample_points=32, te_max_sample_points=32,
           num_workers=0, vis_count=1, geom_warmup_epochs=0,
           sample_steps=4)


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("distill_run"))
    cfg = Config(epochs=2, save_every=2, out_dir=out, **CFG)
    train(cfg, verbose=False)
    return out


def _jump_mse(bundle, pf, stats, teacher_pf, enc_p, enc_s, batch, steps,
              guidance_scale=0.0):
    """MSE between the field's 1-step Euler jump and the teacher's
    2-sub-step Heun jump (optionally CFG-guided) over a fixed batch."""
    cfg = bundle.cfg
    pts = jnp.asarray(batch["pts"], jnp.float32)
    b, n = pts.shape[:2]
    x1 = (jnp.concatenate([pts, jnp.asarray(batch["rgb"], jnp.float32)],
                          axis=-1) if cfg.pf_point_dim == 6 else pts)
    enc_in = (x1 if cfg.enc_in_channels == 6 else pts)
    z, _, _ = bundle.apply_enc(enc_p, enc_s, enc_in, train=False)
    cond = batch.get("cond")
    cond_full = (jnp.concatenate([z, jnp.asarray(cond, z.dtype)], axis=1)
                 if cond is not None else z)
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, x1.shape) * cfg.point_prior_std
    t = jnp.full((b,), 1.0 / steps)
    tb = t[:, None, None]
    x_t = (1 - tb) * x0 + tb * x1
    vf_t = bundle.pf_velocity_fn(teacher_pf["params"],
                                 teacher_pf["batch_stats"])
    from pcfm.sample.integrators import make_guided
    dt = 1.0 / steps
    x_pp = _teacher_two_heun(make_guided(vf_t, cond_full, guidance_scale),
                             x_t, t, dt)
    v_star = (x_pp - x_t) / dt
    v, _ = bundle.apply_pf(pf, stats, x_t, t, cond_full, None, train=False)
    return float(jnp.mean((v - v_star) ** 2))


def test_distill_improves_jump_match(trained_run):
    from pcfm.sample.cli import load_run
    cfg, bundle, state, _ = load_run(trained_run)
    from pcfm.data import DataLoader, get_datasets, to_model_batch
    tr_ds, _ = get_datasets(cfg)
    loader = DataLoader(tr_ds, cfg.batch_size, shuffle=True, drop_last=True,
                        seed=1, num_workers=0)

    def batches(phase):
        while True:
            for b in loader.epoch_batches(phase):
                yield to_model_batch(b, train=True, has_rgb=cfg.has_rgb,
                                     cond_dim=cfg.cond_dim)

    fixed = to_model_batch(next(iter(loader.epoch_batches(99))),
                           train=True, has_rgb=cfg.has_rgb,
                           cond_dim=cfg.cond_dim)
    teacher_pf = {"params": state.ema_pf["params"],
                  "batch_stats": state.ema_pf["batch_stats"]}
    enc_p, enc_s = state.params["enc"], state.batch_stats["enc"]
    steps = max(1, cfg.sample_steps // 2)
    before = _jump_mse(bundle, teacher_pf["params"],
                       teacher_pf["batch_stats"], teacher_pf, enc_p, enc_s,
                       fixed, steps)
    pf_params, pf_ema, out_steps = distill_pf(
        bundle, state, batches, base_steps=cfg.sample_steps, phases=1,
        steps_per_phase=60, lr=3e-4, rng=jax.random.PRNGKey(0),
        verbose=False)
    assert out_steps == steps
    after = _jump_mse(bundle, pf_params, teacher_pf["batch_stats"],
                      teacher_pf, enc_p, enc_s, fixed, steps)
    # the undistilled teacher evaluated on its own secant target is the
    # natural baseline; the student must fit that target better
    assert after < before, (before, after)
    # same tree structure (drop-in pf replacement)
    assert (jax.tree_util.tree_structure(pf_params)
            == jax.tree_util.tree_structure(state.params["pf"]))


def test_distill_guided_field(trained_run):
    """Guided distillation (CFG baked into the student): with
    guidance_scale>0 the phase-0 target is the GUIDED composite field's
    jump; the student — evaluated with NO guidance — must fit that guided
    target better than the raw conditional teacher field does."""
    from pcfm.sample.cli import load_run
    cfg, bundle, state, _ = load_run(trained_run)
    from pcfm.data import DataLoader, get_datasets, to_model_batch
    tr_ds, _ = get_datasets(cfg)
    loader = DataLoader(tr_ds, cfg.batch_size, shuffle=True, drop_last=True,
                        seed=1, num_workers=0)

    def batches(phase):
        while True:
            for b in loader.epoch_batches(phase):
                yield to_model_batch(b, train=True, has_rgb=cfg.has_rgb,
                                     cond_dim=cfg.cond_dim)

    fixed = to_model_batch(next(iter(loader.epoch_batches(99))),
                           train=True, has_rgb=cfg.has_rgb,
                           cond_dim=cfg.cond_dim)
    teacher_pf = {"params": state.ema_pf["params"],
                  "batch_stats": state.ema_pf["batch_stats"]}
    enc_p, enc_s = state.params["enc"], state.batch_stats["enc"]
    steps = max(1, cfg.sample_steps // 2)
    G = 2.0
    before = _jump_mse(bundle, teacher_pf["params"],
                       teacher_pf["batch_stats"], teacher_pf, enc_p, enc_s,
                       fixed, steps, guidance_scale=G)
    pf_params, _, out_steps = distill_pf(
        bundle, state, batches, base_steps=cfg.sample_steps, phases=1,
        steps_per_phase=60, lr=3e-4, rng=jax.random.PRNGKey(0),
        verbose=False, guidance_scale=G)
    assert out_steps == steps
    after = _jump_mse(bundle, pf_params, teacher_pf["batch_stats"],
                      teacher_pf, enc_p, enc_s, fixed, steps,
                      guidance_scale=G)
    assert after < before, (before, after)
    # non-vacuous: the guided target genuinely differs from the unguided one
    unguided = _jump_mse(bundle, teacher_pf["params"],
                         teacher_pf["batch_stats"], teacher_pf, enc_p,
                         enc_s, fixed, steps, guidance_scale=0.0)
    assert abs(before - unguided) > 1e-8, (before, unguided)


def test_distill_phases_zero_rejected(trained_run):
    """Regression (ADVICE r2): phases=0 raised NameError (dstate unbound)
    instead of a clear error."""
    from pcfm.sample.cli import load_run
    cfg, bundle, state, _ = load_run(trained_run)
    with pytest.raises(ValueError, match="phases must be >= 1"):
        distill_pf(bundle, state, lambda p: iter(()), phases=0,
                   verbose=False)


def test_distill_cli_roundtrip(trained_run, tmp_path):
    """Distill CLI -> sample CLI pickup (regression r3: this tail was
    accidentally spliced into the hybrid test below, leaving the
    roundtrip test asserting nothing past the step count)."""
    from pcfm.distill.cli import main as distill_main
    save = str(tmp_path / "distilled")
    out_dir, steps = distill_main(
        ["--out_dir", trained_run, "--save_dir", save, "--phases", "2",
         "--steps_per_phase", "10"])
    assert steps == 1                      # 4 -> 2 -> 1
    from pcfm.sample.cli import main as sample_main
    gen = str(tmp_path / "gen")
    sample_main(["--out_dir", save, "--save_dir", gen,
                 "--num_samples", "2", "--n_points", "32"])
    assert os.path.isfile(os.path.join(gen, "sample_0.ply"))
    import json
    from pcfm.train import checkpoint as ckpt
    path, _ = ckpt.find_latest(save)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    assert meta["config"]["sampler"] == "euler"
    assert meta["config"]["sample_steps"] == 1


def test_distill_cli_hybrid_bn_stats(tmp_path):
    """Regression (ADVICE r2): for a BN-bearing (hybrid) run the distilled
    checkpoint's LIVE batch_stats['pf'] must be the EMA stats the student
    was distilled against, not the teacher run's stale live stats."""
    out = str(tmp_path / "hy_run")
    cfg = Config(epochs=1, save_every=1, out_dir=out,
                 **{**CFG, "pf_backbone": "hybrid", "ctx_dim": 8,
                    "ctx_emb_dim": 16, "ctx_stage_channels": [8],
                    "ctx_stage_blocks": [1], "ctx_stage_res": [4],
                    "sample_steps": 2, "vis_count": 0})
    train(cfg, verbose=False)
    from pcfm.distill.cli import main as distill_main
    save = str(tmp_path / "hy_distilled")
    distill_main(["--out_dir", out, "--save_dir", save, "--phases", "1",
                  "--steps_per_phase", "4"])
    from pcfm.sample.cli import load_run
    _, _, dstate, _ = load_run(save)
    _, _, tstate, _ = load_run(out)
    import chex
    assert jax.tree_util.tree_leaves(dstate.batch_stats["pf"])  # non-vacuous
    chex.assert_trees_all_close(dstate.batch_stats["pf"],
                                tstate.ema_pf["batch_stats"])
    from pcfm.sample.cli import main as sample_main
    gen = str(tmp_path / "gen")
    sample_main(["--out_dir", save, "--save_dir", gen,
                 "--num_samples", "2", "--n_points", "32"])
    assert os.path.isfile(os.path.join(gen, "sample_0.ply"))
    # the saved config must carry the distilled sampler settings
    import json
    from pcfm.train import checkpoint as ckpt
    path, _ = ckpt.find_latest(save)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    assert meta["config"]["sampler"] == "euler"
    assert meta["config"]["sample_steps"] == 1


def test_teacher_two_euler_exact_on_secant_field():
    """A CONVERGED phase>=1 teacher is a secant field (one Euler step of
    its grid size reproduces its teacher's jump): two Euler sub-steps
    recover its own rollout EXACTLY, while Heun sub-steps are biased on
    it.  This pins _teacher_two_euler's math (the teacher_rollout="euler"
    option).  NOTE the end-to-end A/B measured the OPPOSITE preference on
    real, partially-distilled students — Heun re-integration wins and is
    the default (see _teacher_two_euler docstring,
    docs/genq/distill_guided6_run5_ab.json)."""
    from pcfm.distill.progressive import _teacher_two_euler

    n_teacher = 8                        # teacher grid
    h = 1.0 / n_teacher

    def traj(t):                         # nonlinear reference trajectory
        return jnp.sin(3.0 * t)

    def secant_field(x, t):              # what Euler-distillation trains
        return (traj(t + h) - traj(t)) / h * jnp.ones_like(x)

    x0 = jnp.zeros((2, 4, 3)) + traj(0.25)
    t = jnp.full((2,), 0.25)
    dt = 2.0 * h                         # one student step = two teacher steps

    vf = lambda x, tt: secant_field(x, tt[:, None, None])
    x_euler = _teacher_two_euler(vf, x0, t, dt)
    x_heun = _teacher_two_heun(vf, x0, t, dt)
    want = jnp.zeros_like(x0) + traj(0.25 + dt)
    np.testing.assert_allclose(np.asarray(x_euler), np.asarray(want),
                               atol=1e-6)
    # Heun on the secant field misses by O(h * dS): assert the bias the
    # fix removes is material, not noise
    assert float(jnp.max(jnp.abs(x_heun - want))) > 1e-3


def test_distill_cond_dropout_supervises_unconditional(trained_run):
    """cond_drop_p=1.0 must make the distill loss invariant to the joint
    condition values (every row drops to the unconditional branch);
    cond_drop_p=0.0 must not (regression for the unguided-distill-of-a-
    guided-run CLI path, which keeps sample-time CFG alive)."""
    import optax

    from pcfm.sample.cli import load_run
    cfg, bundle, state, _ = load_run(trained_run)
    tx = optax.adamw(1e-4)
    batch = {
        "pts": jnp.asarray(np.random.RandomState(0)
                           .randn(4, 32, 3), jnp.float32),
        "rgb": jnp.asarray(np.random.RandomState(1)
                           .rand(4, 32, 3), jnp.float32),
        "cond": jnp.asarray(np.random.RandomState(2)
                            .randn(4, cfg.cond_dim), jnp.float32)}
    batch2 = dict(batch, cond=batch["cond"] + 5.0)
    teacher = {"params": state.ema_pf["params"],
               "batch_stats": state.ema_pf["batch_stats"]}
    dstate0 = None

    def loss_at(drop_p, b):
        from pcfm.distill.progressive import DistillState
        step = make_distill_step(bundle, tx, phase_steps=2,
                                 cond_drop_p=drop_p)
        ds = DistillState(params=state.params["pf"],
                          ema_params=state.params["pf"],
                          opt_state=tx.init(state.params["pf"]),
                          step=jnp.zeros((), jnp.int32))
        _, m = step(teacher, ds, state.params["enc"],
                    state.batch_stats["enc"], b, jax.random.PRNGKey(9))
        return float(m["loss_distill"])

    assert loss_at(1.0, batch) == pytest.approx(loss_at(1.0, batch2),
                                                rel=1e-6)
    assert loss_at(0.0, batch) != pytest.approx(loss_at(0.0, batch2),
                                                rel=1e-3)
