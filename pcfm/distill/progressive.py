"""Progressive velocity-field distillation — few-NFE sampling.

Beyond-reference capability (ROADMAP #8): the reference samples with a
fixed 50-step Heun loop = 100 network evals per flow (train.py:332-341).
Progressive distillation (Salimans & Ho, "Progressive Distillation for
Fast Sampling of Diffusion Models", ICLR 2022, re-derived here for the
rectified-flow *velocity* parameterization) halves that repeatedly:

  phase p trains a student for N_p = N / 2^p Euler steps.  For a grid
  time t = k/N_p and the FM marginal point x_t = (1-t) x0 + t x1
  (x0 ~ prior, x1 ~ data — exactly the training-time interpolant,
  train.py:585-607), the TEACHER advances one student step dt = 1/N_p
  with TWO Heun sub-steps of size dt/2, reaching x''.  The student
  regresses its velocity onto the secant

      v*(x_t, t) = (x'' - x_t) / dt,

  so ONE student Euler step reproduces the teacher's two-sub-step jump.
  After each phase the student (EMA) becomes the next teacher.

The distilled field drops into the existing samplers unchanged — sampling
with `sampler="euler", sample_steps=N_p` gives teacher-quality shapes at
1/2^p the NFE (the sampler wall-clock is linear in NFE).

Only the point flow is distilled: the latent flow integrates a (B, 128)
vector — microseconds per step — while each point-flow eval is a full
backbone forward over 20k points.
"""
from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from pcfm.sample.priors import make_pf_prior
from pcfm.train.state import ModelBundle, TrainState, ema_update


class DistillState(flax.struct.PyTreeNode):
    params: Any          # student pf params
    ema_params: Any      # student EMA (becomes the next-phase teacher)
    opt_state: Any
    step: jnp.ndarray


def _teacher_two_heun(vf: Callable, x, t, dt):
    """Two Heun (RK2) sub-steps of size dt/2 from (x, t) -> x''.

    Right for the PHASE-0 teacher only: the trained network is a
    continuous velocity field, so higher-order integration gives the most
    accurate rollout target."""
    h = dt / 2.0
    v1 = vf(x, t)
    v2 = vf(x + h * v1, t + h)
    x_mid = x + 0.5 * h * (v1 + v2)
    v3 = vf(x_mid, t + h)
    v4 = vf(x_mid + h * v3, t + dt)
    return x_mid + 0.5 * h * (v3 + v4)


def _teacher_two_euler(vf: Callable, x, t, dt):
    """Two EULER sub-steps of size dt/2 from (x, t) -> x''.

    The Salimans-Ho-faithful rollout for phase >= 1 teachers: a
    previous-phase student was trained so one Euler step of its own grid
    size (= dt/2 here) reproduces ITS teacher's jump — a secant field,
    which this advances with its own sampler (exactness pinned by
    tests/test_distill.py test_teacher_two_euler_exact_on_secant_field).

    MEASURED WORSE end-to-end than Heun re-integration (hardware A/B,
    docs/genq/distill_guided6_run5_ab.json: 6-NFE guided student 1-NNA
    1.0 vs 0.865, endpoint CD 0.00209 vs 0.00113): a 600-step phase
    leaves the student closer to a continuous field than to a converged
    secant, and Euler rollout COMPOUNDS its residual bias across phases,
    while Heun's second evaluation cancels it toward the true ODE.
    Kept as the ``teacher_rollout="euler"`` option; the default is
    "heun"."""
    h = dt / 2.0
    x1 = x + h * vf(x, t)
    return x1 + h * vf(x1, t + h)


def make_distill_step(bundle: ModelBundle, tx: optax.GradientTransformation,
                      phase_steps: int, ema_decay: float = 0.999,
                      guidance_scale: float = 0.0,
                      teacher_rollout: str = "heun",
                      cond_drop_p: float = 0.0):
    """Jitted distillation step for one phase (student grid = phase_steps).

    Signature: (teacher_pf, dstate, enc_params, enc_stats, batch, rng)
    -> (dstate, metrics); `teacher_pf` is {'params', 'batch_stats'}.
    BN runs in eval mode throughout (running stats frozen at their trained
    values — the reference's set_bn_eval discipline, models.py:663-673).

    guidance_scale > 0 distills the CLASSIFIER-FREE-GUIDED composite field
    ``v_c + s (v_c - v_u)`` (guided distillation, Meng et al. 2023 applied
    to the rectified-flow velocity): the teacher rollout integrates the
    guided field while the student sees only the conditional input — the
    guidance is baked into the student's weights, so few-step sampling
    runs at guidance 0 (ONE forward per eval instead of the CFG 2B batch).

    teacher_rollout: "heun" (default — best measured end-to-end for every
    phase) or "euler" (Salimans-Ho-faithful secant rollout for phase >= 1
    teachers; measured worse — see _teacher_two_euler).

    cond_drop_p > 0 zeroes the condition on a Bernoulli row subset (the
    teacher rollout AND the student see the same zeroed cond), keeping the
    student's unconditional branch supervised — required when the saved
    run will still apply CFG at sample time.
    """
    cfg = bundle.cfg
    n_steps = float(phase_steps)
    two_step = {"heun": _teacher_two_heun,
                "euler": _teacher_two_euler}[teacher_rollout]

    def loss_fn(params_s, teacher_pf, enc_params, enc_stats, batch, rng):
        pts = batch["pts"].astype(jnp.float32)
        b, n = pts.shape[:2]
        k_prior, k_t, k_drop = jax.random.split(rng, 3)

        # x1 / encoder input exactly as the train step builds them
        # (rgb may be absent from the batch — the train step substitutes
        # zeros, pcfm/train/step.py:84-88)
        rgb = batch.get("rgb")
        rgb = (rgb.astype(jnp.float32) if rgb is not None
               else jnp.zeros_like(pts))
        x1 = (jnp.concatenate([pts, rgb], axis=-1)
              if cfg.pf_point_dim == 6 else pts)
        enc_in = (jnp.concatenate([pts, rgb], axis=-1)
                  if cfg.enc_in_channels == 6 else pts)
        z, _, _ = bundle.apply_enc(enc_params, enc_stats, enc_in,
                                   train=False)
        from pcfm.train.evaluate import _cond_full
        cond_full = _cond_full(cfg, z, batch.get("cond"))
        if cond_drop_p > 0:
            keep = (jax.random.uniform(k_drop, (b, 1))
                    >= cond_drop_p).astype(cond_full.dtype)
            cond_full = cond_full * keep

        x0 = make_pf_prior(k_prior, (b, n, cfg.pf_point_dim),
                           cfg.point_prior_std, cfg.color_prior,
                           cfg.color_prior_std)
        # student grid times t = k/N_p, k ~ U{0..N_p-1}
        k_idx = jax.random.randint(k_t, (b,), 0, phase_steps)
        t = k_idx.astype(jnp.float32) / n_steps
        tb = t[:, None, None]
        x_t = (1.0 - tb) * x0 + tb * x1

        vf_t = bundle.pf_velocity_fn(teacher_pf["params"],
                                     teacher_pf["batch_stats"])
        from pcfm.sample.integrators import make_guided
        teacher_vf = make_guided(vf_t, cond_full, guidance_scale)
        dt = 1.0 / n_steps
        x_pp = jax.lax.stop_gradient(two_step(teacher_vf, x_t, t, dt))
        v_star = (x_pp - x_t) / dt

        v_s, _ = bundle.apply_pf(params_s, teacher_pf["batch_stats"], x_t,
                                 t, cond_full, None, train=False)
        loss = jnp.mean((v_s.astype(jnp.float32) - v_star) ** 2)
        return loss

    @jax.jit
    def distill_step(teacher_pf, dstate: DistillState, enc_params,
                     enc_stats, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            dstate.params, teacher_pf, enc_params, enc_stats, batch, rng)
        updates, opt_state = tx.update(grads, dstate.opt_state,
                                       dstate.params)
        params = optax.apply_updates(dstate.params, updates)
        ema = ema_update(dstate.ema_params, params, ema_decay)
        return dstate.replace(params=params, ema_params=ema,
                              opt_state=opt_state, step=dstate.step + 1), \
            {"loss_distill": loss}

    return distill_step


def distill_pf(bundle: ModelBundle, state: TrainState,
               batches: Callable[[int], Iterable[dict]],
               base_steps: int = 50, phases: int = 3,
               steps_per_phase: int = 400, lr: float = 1e-4,
               ema_decay: float = 0.999, rng: Optional[jax.Array] = None,
               use_ema_teacher: bool = True, verbose: bool = True,
               guidance_scale: float = 0.0, cond_drop_p: float = 0.0,
               teacher_rollout: str = "heun"):
    """Run `phases` halvings starting from the trained point flow.

    Args:
      batches: phase index -> iterable of model batches (pts/rgb/cond),
        e.g. re-winding a DataLoader each phase.
      base_steps: the teacher's step count at phase 0 (the run's
        sample_steps).
      guidance_scale: if > 0, phase 0 distills the CFG-guided composite
        field (see make_distill_step) — later phases distill the phase-0
        student, which already has the guidance baked in, so they run
        unguided (applying CFG again would compound the scale).
      teacher_rollout: two-sub-step integrator for phase >= 1 teachers —
        "heun" (default, measured best) or "euler" (see
        _teacher_two_euler for the measured A/B).
    Returns (pf_params, pf_ema_params, final_steps): the distilled student
    (drop-in replacements for state.params['pf'] / ema_pf['params']) and
    its Euler step count base_steps // 2^phases.  Sample the student with
    guidance_scale=0 regardless of the distillation scale.
    """
    if phases < 1:
        raise ValueError(f"distill_pf: phases must be >= 1, got {phases} "
                         "(each phase halves the NFE; 0 phases would be a "
                         "no-op)")
    rng = jax.random.PRNGKey(0) if rng is None else rng
    teacher_pf = {
        "params": state.ema_pf["params"] if use_ema_teacher
        else state.params["pf"],
        "batch_stats": state.ema_pf["batch_stats"] if use_ema_teacher
        else state.batch_stats["pf"],
    }
    enc_params, enc_stats = state.params["enc"], state.batch_stats["enc"]
    student = jax.tree_util.tree_map(jnp.copy, teacher_pf["params"])

    steps = base_steps
    for phase in range(phases):
        steps = max(1, steps // 2)
        tx = optax.adamw(lr, weight_decay=1e-4)
        dstate = DistillState(
            params=student,
            ema_params=jax.tree_util.tree_map(jnp.copy, student),
            opt_state=tx.init(student), step=jnp.zeros((), jnp.int32))
        dstep = make_distill_step(bundle, tx, steps, ema_decay,
                                  guidance_scale=(guidance_scale
                                                  if phase == 0 else 0.0),
                                  # phase 0 is always the trained
                                  # continuous field -> Heun; later
                                  # phases default to Heun too (measured
                                  # better than the secant-faithful
                                  # Euler rollout — _teacher_two_euler)
                                  teacher_rollout=("heun" if phase == 0
                                                   else teacher_rollout),
                                  cond_drop_p=cond_drop_p)
        it = 0
        m = None
        for batch in batches(phase):
            rng, sk = jax.random.split(rng)
            dstate, m = dstep(teacher_pf, dstate, enc_params, enc_stats,
                              batch, sk)
            it += 1
            if it >= steps_per_phase:
                break
        if m is None:
            raise ValueError(f"distill phase {phase}: batches() yielded "
                             "no batches")
        if verbose:
            print(f"[distill] phase {phase + 1}/{phases}: student at "
                  f"{steps} Euler steps, {it} opt steps, final loss "
                  f"{float(m['loss_distill']):.5f}", flush=True)
        # student (EMA) graduates to teacher for the next halving
        teacher_pf = {"params": dstate.ema_params,
                      "batch_stats": teacher_pf["batch_stats"]}
        student = dstate.ema_params

    # (live student params, EMA shadow) — distinct trees, mirroring the
    # train-state convention
    return dstate.params, dstate.ema_params, steps
