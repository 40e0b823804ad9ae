"""The jitted flow-matching train step.

Port of the reference hot loop (train.py:553-673) as ONE pure function:
  * encoder z = enc([pts || rgb*color_on])   (geometry-warmup zeroes RGB)
  * point-flow FM: t ~ Beta(a,1), x_t = (1-t) z0 + t x1, target v = x1 - z0,
    MSE split pos/color with lambda_color weighting
  * latent-flow FM on detached z (unconditional)
  * optional VICReg-style zreg/var/cov penalties and a GRL adversary
  * joint grad clip + per-submodel AdamW + EMA updates

Epoch-dependent switches (geometry warmup, CFG-dropout warmup) enter as
traced scalars ``color_on`` in {0,1} and ``drop_p_now`` in [0, cfg_drop_p],
so ONE compiled graph serves every epoch (no recompiles at warmup
boundaries).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from pcfm.models.adversary import grad_reverse
from pcfm.train.state import ModelBundle, TrainState, ema_update


def mse(a, b):
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def sliced_ot_permutation(key, data_xyz, prior_xyz):
    """(B,N) permutation pairing prior to data points by rank along one
    random direction — the exact 1-D OT (monotone rearrangement) in the
    projected space; a fresh direction per step makes it sliced OT in
    expectation.  Returns perm with new_prior[i] = prior[perm[i]] paired
    to data[i]; applying it permutes the prior's points (marginal
    unchanged), only the FM coupling tightens."""
    u = jax.random.normal(key, (3,))
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-6)
    rank_d = jnp.argsort(jnp.einsum("bnd,d->bn", data_xyz, u), axis=1)
    rank_p = jnp.argsort(jnp.einsum("bnd,d->bn", prior_xyz, u), axis=1)
    # the k-th ranked prior point lands at the k-th ranked data slot:
    # new_prior[rank_d[k]] = prior[rank_p[k]] => perm[i] = rank_p[inv_d[i]]
    inv_d = jnp.argsort(rank_d, axis=1)
    return jnp.take_along_axis(rank_p, inv_d, axis=1)


def fm_interpolate(key_t, x1, z0, t_beta_a: float):
    """t ~ Beta(a, 1) skewed toward 1; x_t and target velocity."""
    b = x1.shape[0]
    t = jax.random.beta(key_t, t_beta_a, 1.0, (b,)).astype(jnp.float32)
    tb = t.reshape((b,) + (1,) * (x1.ndim - 1))
    x_t = (1.0 - tb) * z0 + tb * x1
    return t, x_t, x1 - z0


def train_step(bundle: ModelBundle, tx, state: TrainState,
               batch: Dict[str, jax.Array], rng: jax.Array,
               color_on: jax.Array, drop_p_now: jax.Array):
    """One optimizer step.  batch keys: 'pts' (B,N,3); optional 'rgb'
    (B,N,3) in [0,1]; optional 'cond' (B,C).  Returns (state, metrics)."""
    cfg = bundle.cfg
    pts = batch["pts"].astype(jnp.float32)
    rgb = batch.get("rgb")
    cond_j = batch.get("cond")
    bsz, n, _ = pts.shape
    if cond_j is None and cfg.cond_dim > 0:
        # zero-pad a missing condition (reference pads in val,
        # train.py:321-324; keeps pf_cond_dim consistent)
        cond_j = jnp.zeros((bsz, cfg.cond_dim), jnp.float32)
    keys = jax.random.split(rng, 6)
    k_t, k_prior, k_tz, k_priorz, k_drop, k_pair = keys

    # ---- inputs that don't need gradients: priors / t / masks ----
    if cfg.pf_point_dim == 6 and rgb is not None:
        data_pf = jnp.concatenate([pts, rgb * color_on], axis=-1)
        kx, kc = jax.random.split(k_prior)
        z_xyz = jax.random.normal(kx, (bsz, n, 3)) * cfg.point_prior_std
        if cfg.color_prior == "gauss":
            z_rgb = jax.random.normal(kc, (bsz, n, 3)) * cfg.color_prior_std
        elif cfg.color_prior == "uniform":
            z_rgb = jax.random.uniform(kc, (bsz, n, 3))
        else:
            z_rgb = jnp.zeros((bsz, n, 3))
        # geometry warmup: color prior zeroed together with color data
        z_pts = jnp.concatenate([z_xyz, z_rgb * color_on], axis=-1)
    else:
        data_pf = pts
        z_pts = jax.random.normal(k_prior, pts.shape) * cfg.point_prior_std

    if cfg.fm_coupling == "sliced_ot":
        # density-aware minibatch coupling (see sliced_ot_permutation).
        # NOTE: under sequence parallelism the point-axis argsort forces
        # XLA to gather the point axis; use on dp-only meshes.
        perm = sliced_ot_permutation(jax.random.fold_in(k_prior, 1),
                                     pts, z_pts[..., :3])
        z_pts = jnp.take_along_axis(z_pts, perm[..., None], axis=1)

    t_pts, x_t, target_v = fm_interpolate(k_t, data_pf, z_pts, cfg.t_beta_a)

    # CFG dropout mask (1 -> dropped), Bernoulli(drop_p_now)
    drop = (jax.random.uniform(k_drop, (bsz,)) < drop_p_now).astype(
        jnp.float32)
    cond_drop_mask = drop[:, None]

    # encoder input (warmup zeroes RGB but keeps 6 channels, train.py:565-578)
    if cfg.enc_in_channels == 6:
        rgb_in = (rgb if rgb is not None else jnp.zeros_like(pts)) * color_on
        enc_in = jnp.concatenate([pts, rgb_in], axis=-1)
    else:
        enc_in = pts

    def loss_fn(params):
        new_stats = {}
        z, _, new_stats["enc"] = bundle.apply_enc(
            params["enc"], state.batch_stats["enc"], enc_in, train=True)

        cond_full = z if cond_j is None else jnp.concatenate(
            [z, cond_j.astype(z.dtype)], axis=1)

        pred_v, new_stats["pf"] = bundle.apply_pf(
            params["pf"], state.batch_stats["pf"], x_t, t_pts, cond_full,
            cond_drop_mask, train=True)

        if cfg.pf_point_dim == 6:
            loss_pos = mse(pred_v[..., :3], target_v[..., :3])
            loss_col = mse(pred_v[..., 3:], target_v[..., 3:])
            # warmup: color loss excluded (color_on = 0)
            loss_point = loss_pos + cfg.lambda_color * color_on * loss_col
        else:
            loss_pos = mse(pred_v, target_v)
            loss_col = jnp.float32(0.0)
            loss_point = loss_pos

        # ---- latent flow on detached z (train.py:635-645) ----
        z_det = jax.lax.stop_gradient(z)
        eps_z = jax.random.normal(k_priorz, z_det.shape) * cfg.latent_prior_std
        t_z, y_t, target_vz = fm_interpolate(k_tz, z_det, eps_z, cfg.t_beta_a)
        pred_vz = bundle.apply_lf(params["lf"], y_t, t_z, None)
        loss_latent = mse(pred_vz, target_vz)

        loss = cfg.lambda_point * loss_point + cfg.lambda_latent * loss_latent
        metrics = {"loss_point": loss_point, "loss_latent": loss_latent,
                   "loss_pos": loss_pos, "loss_col": loss_col}

        if cfg.lambda_emd > 0:
            # density-aware endpoint EMD (see Config.lambda_emd): the
            # one-step extrapolation to t=1 under the predicted field,
            # matched to the data cloud as a MEASURE (approxmatch, analytic
            # VJP).  xyz only — density is geometric; fp32 throughout.
            from pcfm.ops.emd import earth_mover_distance
            tb = t_pts.reshape((bsz, 1, 1)).astype(jnp.float32)
            x1_hat = (x_t[..., :3].astype(jnp.float32)
                      + (1.0 - tb) * pred_v[..., :3].astype(jnp.float32))
            emd_loss = jnp.mean(earth_mover_distance(x1_hat, pts))
            loss = loss + cfg.lambda_emd * emd_loss
            metrics["loss_emd"] = emd_loss

        # ---- documented-but-unwired reference lambdas, wired here ----
        if cfg.lambda_zreg > 0:
            zreg = jnp.mean(z ** 2)
            loss = loss + cfg.lambda_zreg * zreg
            metrics["loss_zreg"] = zreg
        if cfg.lambda_var > 0:
            std = jnp.sqrt(jnp.var(z, axis=0) + 1e-4)
            var_loss = jnp.mean(jax.nn.relu(1.0 - std))
            loss = loss + cfg.lambda_var * var_loss
            metrics["loss_var"] = var_loss
        if cfg.lambda_cov > 0:
            zc = z - jnp.mean(z, axis=0, keepdims=True)
            cov = (zc.T @ zc) / max(1, bsz - 1)
            off = cov - jnp.diag(jnp.diag(cov))
            cov_loss = jnp.sum(off ** 2) / z.shape[-1]
            loss = loss + cfg.lambda_cov * cov_loss
            metrics["loss_cov"] = cov_loss
        if cfg.lambda_pair > 0:
            # pair-consistency: a second random point subsample of the same
            # clouds must encode to the same z
            idx2 = jax.random.randint(k_pair, (bsz, n), 0, n)
            enc_in2 = jnp.take_along_axis(enc_in, idx2[..., None], axis=1)
            z2, _, _ = bundle.apply_enc(params["enc"],
                                        state.batch_stats["enc"], enc_in2,
                                        train=False)
            pair_loss = mse(z, z2)
            loss = loss + cfg.lambda_pair * pair_loss
            metrics["loss_pair"] = pair_loss
        if bundle.adv is not None and cond_j is not None:
            z_rev = grad_reverse(z, cfg.lambda_adv)
            adv_pred = bundle.adv.apply({"params": params["adv"]}, z_rev)
            adv_loss = mse(adv_pred, cond_j)
            loss = loss + adv_loss
            metrics["loss_adv"] = adv_loss

        metrics["loss"] = loss
        return loss, (new_stats, metrics)

    (loss, (new_stats, metrics)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)

    if cfg.flat_optimizer:
        # the flat fused AdamW clips jointly inside its single raveled
        # update and stores the norm for the metric (flat_opt.py)
        gnorm = None
    else:
        # joint global-norm clip (train.py:653-657), computed ONCE and
        # shared with the grad_norm metric
        gnorm = optax.global_norm(grads)
        if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
            scale = cfg.grad_clip_norm / jnp.maximum(gnorm,
                                                     cfg.grad_clip_norm)
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)

    batch_stats = dict(state.batch_stats)
    batch_stats.update({k: v for k, v in new_stats.items() if v})

    ema_pf = ema_update(state.ema_pf,
                        {"params": new_params["pf"],
                         "batch_stats": batch_stats["pf"]}, cfg.ema_decay)
    ema_lf = ema_update(state.ema_lf,
                        {"params": new_params["lf"],
                         "batch_stats": batch_stats["lf"]}, cfg.ema_decay)

    new_state = state.replace(params=new_params, batch_stats=batch_stats,
                              opt_state=new_opt_state, ema_pf=ema_pf,
                              ema_lf=ema_lf, step=state.step + 1)
    metrics["grad_norm"] = (new_opt_state.gnorm if gnorm is None
                            else gnorm)
    return new_state, metrics


def make_train_step(bundle: ModelBundle, tx, donate: bool = True):
    """jit-compile the train step once per (bundle, tx)."""
    fn = functools.partial(train_step, bundle, tx)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
