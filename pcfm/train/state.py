"""Train state: one pytree holding everything the reference spreads across
three DDP modules + EMA shadows + optimizer + scaler (train.py:201-258).

In JAX the EMA-weight swap for eval (reference use_ema_weights,
train.py:24-60) is trivial: evaluation just applies the EMA subtree instead
of the live params — no copying/restoring.
"""
from __future__ import annotations

from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax
from flax.core import unfreeze

from pcfm.config import Config
from pcfm.models import (CondAdversary, ConditionalLatentVelocityNet,
                         HybridMLP, ShapeEncoder, VelocityNet)


class TrainState(flax.struct.PyTreeNode):
    params: Any          # {'enc': ..., 'pf': ..., 'lf': ..., ['adv': ...]}
    batch_stats: Any     # same keys; {} where a model has no BN
    opt_state: Any
    ema_pf: Any          # {'params': ..., 'batch_stats': ...}
    ema_lf: Any
    step: jnp.ndarray    # int32 global step


def resolve_voxel_backend(flag: str) -> str:
    """"auto" -> the sorted-window Pallas kernels on TPU, XLA elsewhere
    (off-TPU the sorted path would run in interpret mode — correct but
    slow, so it must be requested explicitly)."""
    if flag == "auto":
        import jax as _jax
        return "sorted" if _jax.default_backend() == "tpu" else "xla"
    return flag


class ModelBundle:
    """Static (non-pytree) bundle of flax modules built from a Config."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        dtype = jnp.bfloat16 if (cfg.amp and cfg.use_bf16) else jnp.float32
        self.dtype = dtype
        self.enc = ShapeEncoder(latent_dim=cfg.latent_dim, width=cfg.enc_width,
                                depth=cfg.enc_depth,
                                in_channels=cfg.enc_in_channels, dtype=dtype)
        if cfg.pf_backbone == "mlp":
            self.pf = VelocityNet(cond_dim=cfg.pf_cond_dim, width=cfg.pf_width,
                                  depth=cfg.pf_depth, emb_dim=cfg.pf_emb_dim,
                                  cfg_dropout_p=cfg.cfg_drop_p,
                                  point_dim=cfg.pf_point_dim, dtype=dtype,
                                  fused_trunk=cfg.fused_trunk,
                                  film_every=cfg.pf_film_every)
            self.pf_has_bn = False
        elif cfg.pf_backbone == "hybrid":
            self.pf = HybridMLP(
                cond_dim=cfg.pf_cond_dim, point_dim=cfg.pf_point_dim,
                ctx_dim=cfg.ctx_dim, ctx_emb_dim=cfg.ctx_emb_dim,
                stage_channels=tuple(cfg.ctx_stage_channels),
                stage_blocks=tuple(cfg.ctx_stage_blocks),
                stage_res=tuple(cfg.ctx_stage_res),
                with_se=cfg.ctx_with_se, norm_type=cfg.ctx_norm,
                gn_groups=cfg.ctx_gn_groups,
                with_global=cfg.ctx_with_global,
                voxel_normalize=cfg.ctx_voxel_normalize,
                use_t_gate=True, t_gate_k=cfg.ctx_t_gate_k,
                t_gate_tau=cfg.ctx_t_gate_tau,
                pf_width=cfg.pf_width, pf_depth=cfg.pf_depth,
                pf_emb_dim=cfg.pf_emb_dim, cfg_dropout_p=cfg.cfg_drop_p,
                dtype=dtype, voxel_backend=resolve_voxel_backend(
                    cfg.voxel_backend),
                bn_impl=("" if cfg.grid_bn == "auto" else cfg.grid_bn),
                fused_trunk=cfg.fused_trunk,
                film_every=cfg.pf_film_every,
                ctx_island_dtype=(jnp.bfloat16 if cfg.ctx_dtype == "bf16"
                                  else jnp.float32))
            self.pf_has_bn = True
        else:
            raise ValueError(f"unknown pf_backbone '{cfg.pf_backbone}'")
        self.lf = ConditionalLatentVelocityNet(
            latent_dim=cfg.latent_dim, cond_dim=0, width=cfg.lf_width,
            depth=cfg.lf_depth, emb_dim=cfg.lf_emb_dim, dtype=dtype)
        self.adv = (CondAdversary(cond_dim=cfg.cond_dim)
                    if (cfg.lambda_adv > 0 and cfg.cond_dim > 0) else None)

    # ---- apply helpers: v = f(variables, inputs...) with BN handling ----

    def apply_enc(self, params, batch_stats, x, train: bool):
        variables = {"params": params, **({"batch_stats": batch_stats}
                                          if batch_stats else {})}
        out = self.enc.apply(variables, x,
                             mutable=["batch_stats"] if (train and batch_stats)
                             else False)
        if train and batch_stats:
            (z, h), updates = out
            return z, h, updates.get("batch_stats", {})
        z, h = out
        return z, h, batch_stats

    def apply_pf(self, params, batch_stats, x, t, cond, cond_drop_mask,
                 train: bool):
        variables = {"params": params, **({"batch_stats": batch_stats}
                                          if batch_stats else {})}
        kwargs = dict(cond_drop_mask=cond_drop_mask)
        if self.pf_has_bn:
            kwargs["train"] = train
        if train and batch_stats:
            v, updates = self.pf.apply(variables, x, t, cond,
                                       mutable=["batch_stats"], **kwargs)
            return v, updates.get("batch_stats", {})
        v = self.pf.apply(variables, x, t, cond, **kwargs)
        return v, batch_stats

    def apply_lf(self, params, y, t, cond=None, cond_drop_mask=None):
        return self.lf.apply({"params": params}, y, t, cond,
                             cond_drop_mask=cond_drop_mask)

    def pf_velocity_fn(self, params, batch_stats) -> Callable:
        """Closure v(x, t, cond) for the samplers (eval mode)."""
        def vf(x, t, cond):
            v, _ = self.apply_pf(params, batch_stats, x, t, cond, None,
                                 train=False)
            return v
        return vf

    def lf_velocity_fn(self, params) -> Callable:
        def vf(y, t, cond):
            return self.apply_lf(params, y, t, cond)
        return vf


def cosine_lr(step, total: int, base_lr: float, min_lr: float = 1e-6,
              warmup: int = 0):
    """Warmup + cosine schedule (port of util.py:113-117), traced-friendly."""
    step = jnp.asarray(step, jnp.float32)
    warm = min_lr + (base_lr - min_lr) * step / max(1, warmup)
    # clamp: past total_steps the cosine would swing back UP toward
    # base_lr (review — reachable when len(loader) underestimates the
    # actual steps per epoch); hold min_lr instead
    t = jnp.clip((step - warmup) / max(1, total - warmup), 0.0, 1.0)
    cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * t))
    return jnp.where(step < warmup, warm, cos)


GROUP_LR = {"enc": "lr_enc", "pf": "lr_pf", "lf": "lr_lf", "adv": "lr_enc"}


def make_optimizer(cfg: Config, total_steps: int) -> optax.GradientTransformation:
    """Joint global-norm clip + per-submodel AdamW with its own cosine LR —
    the reference's 3 param groups (train.py:249-253) + clip
    (train.py:653-657).

    Default backend is the FLAT fused AdamW (pcfm/train/flat_opt.py): one
    raveled update instead of ~10 ops x ~400 leaves of dispatch;
    ``cfg.flat_optimizer=False`` selects the leaf-wise optax chain (kept
    for cross-checking — `tests/test_flat_opt.py` proves equality)."""
    if cfg.flat_optimizer:
        from pcfm.train.flat_opt import flat_adamw

        def base_lrs(params):
            return {k: jax.tree_util.tree_map(
                lambda _: getattr(cfg, GROUP_LR[k]), v)
                for k, v in params.items()}

        return flat_adamw(base_lrs, total_steps, b1=0.9, b2=0.999,
                          eps=1e-8, weight_decay=cfg.weight_decay,
                          clip_norm=cfg.grad_clip_norm or 0.0,
                          use_cosine=cfg.use_cosine_lr, min_lr=cfg.min_lr,
                          warmup_steps=cfg.warmup_steps)

    def sched(base_lr):
        if not cfg.use_cosine_lr:
            return base_lr
        return lambda step: cosine_lr(step, total_steps, base_lr, cfg.min_lr,
                                      cfg.warmup_steps)

    def adamw(base_lr):
        return optax.adamw(learning_rate=sched(base_lr), b1=0.9, b2=0.999,
                           eps=1e-8, weight_decay=cfg.weight_decay)

    txs = {k: adamw(getattr(cfg, v)) for k, v in GROUP_LR.items()}

    def labels(params):
        return {k: jax.tree_util.tree_map(lambda _: k, v)
                for k, v in params.items()}

    # NOTE: with the optax backend, global-norm clipping is applied INSIDE
    # train_step (one norm computation shared with the grad_norm metric);
    # the flat backend clips within its single fused update.
    return optax.multi_transform(txs, labels)


def init_state(cfg: Config, rng: jax.Array, total_steps: int) -> tuple:
    """Initialize (bundle, state) with zero-step optimizer and EMA=init."""
    bundle = ModelBundle(cfg)
    b, n = 2, max(8, min(64, cfg.tr_max_sample_points))
    k_enc, k_pf, k_lf, k_adv = jax.random.split(rng, 4)

    enc_vars = bundle.enc.init(
        k_enc, jnp.zeros((b, n, cfg.enc_in_channels), jnp.float32))
    pf_kwargs = dict(cond_drop_mask=None)
    if bundle.pf_has_bn:
        pf_kwargs["train"] = False
    pf_vars = bundle.pf.init(
        k_pf, jnp.zeros((b, n, cfg.pf_point_dim), jnp.float32),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b, cfg.pf_cond_dim), jnp.float32), **pf_kwargs)
    lf_vars = bundle.lf.init(
        k_lf, jnp.zeros((b, cfg.latent_dim), jnp.float32),
        jnp.zeros((b,), jnp.float32), None)

    params = {"enc": unfreeze(enc_vars)["params"],
              "pf": unfreeze(pf_vars)["params"],
              "lf": unfreeze(lf_vars)["params"]}
    batch_stats = {"enc": unfreeze(enc_vars).get("batch_stats", {}),
                   "pf": unfreeze(pf_vars).get("batch_stats", {}),
                   "lf": unfreeze(lf_vars).get("batch_stats", {})}
    if bundle.adv is not None:
        adv_vars = bundle.adv.init(
            k_adv, jnp.zeros((b, cfg.latent_dim), jnp.float32))
        params["adv"] = unfreeze(adv_vars)["params"]

    tx = make_optimizer(cfg, total_steps)
    opt_state = tx.init(params)
    ema_pf = {"params": jax.tree_util.tree_map(jnp.copy, params["pf"]),
              "batch_stats": jax.tree_util.tree_map(jnp.copy,
                                                    batch_stats["pf"])}
    ema_lf = {"params": jax.tree_util.tree_map(jnp.copy, params["lf"]),
              "batch_stats": jax.tree_util.tree_map(jnp.copy,
                                                    batch_stats["lf"])}
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=opt_state, ema_pf=ema_pf, ema_lf=ema_lf,
                       step=jnp.zeros((), jnp.int32))
    return bundle, state, tx


def ema_update(shadow, new, decay: float):
    """shadow <- d*shadow + (1-d)*new on every float leaf (util.py:11-24)."""
    return jax.tree_util.tree_map(
        lambda s, v: s * decay + v.astype(s.dtype) * (1.0 - decay),
        shadow, new)


def count_parameters(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
