"""Import reference PyTorch checkpoints into pcfm.

The reference trainer saves ``ckpts/hybrid_ep{ep:04d}.pt`` dicts with keys
``encoder``/``pf``/``lf`` (module state_dicts), ``ema_pf``/``ema_lf`` (EMA
shadows keyed like the state_dicts), ``args`` (full CLI namespace incl. the
derived ``enc_in_channels``/``pf_point_dim``/``has_rgb``), ``cond_dim``,
``opt``, ``scaler`` and ``global_step`` (reference train.py:682-708).

This module maps those tensors into a pcfm ``TrainState`` so a user of the
reference can continue training / sampling / eval here without retraining:

* torch ``Linear (out,in)`` -> flax ``Dense`` kernel ``(in,out)``,
* ``Conv1d (out,in,1)`` (SharedMLP / ContextNet heads) -> Dense kernel,
* ``Conv3d (out,in,3,3,3)`` -> flax ``(3,3,3,in,out)``,
* conv biases that feed straight into a BatchNorm are folded into the BN
  running mean (pcfm's convs are bias-free; eval- and train-equivalent:
  ``BN(xW+b; mu,var) == BN(xW; mu-b,var)``),
* BN running stats -> ``batch_stats`` collection; EMA shadows -> the
  ``ema_pf``/``ema_lf`` param+stats subtrees.

Optimizer moments and the AMP scaler are NOT imported — optax state is
rebuilt fresh (use ``--warmup_steps`` on the continued run).  Param-key
naming on both sides is pinned by the transplant parity tests
(tests/test_torch_parity*.py); this module is additionally validated
structurally against ``init_state`` at import time.

Supported backbones: ``mlp`` and ``hybrid`` with every reference
``ctx_norm`` ("group" — the reference default, "batch"/"syncbn" — the
per-FiLM + head-norm running stats map into the pcfm ``batch_stats``
``norm/bn`` subtrees, and "none").
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from pcfm.config import Config

Tree = Dict[str, Any]


# ---------------------------------------------------------------- leaves

def _np(v) -> np.ndarray:
    """torch tensor (cpu) or array-like -> float32/raw numpy."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _unwrap_ddp(sd: Tree) -> Tree:
    """Strip a uniform 'module.' prefix (a state_dict taken from a live
    DistributedDataParallel wrapper; the reference trainer unwraps before
    saving, train.py:687-689, but hand-rolled exports often don't)."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _lin(sd: Tree, p: str) -> Tree:
    """torch nn.Linear -> flax Dense {kernel,bias}."""
    out = {"kernel": _np(sd[f"{p}.weight"]).T}
    if f"{p}.bias" in sd:
        out["bias"] = _np(sd[f"{p}.bias"])
    return out


def _conv1d(sd: Tree, p: str) -> Tree:
    """torch nn.Conv1d(k=1) -> flax Dense {kernel,bias}."""
    w = _np(sd[f"{p}.weight"])                 # (out, in, 1)
    out = {"kernel": w[:, :, 0].T}
    if f"{p}.bias" in sd:
        out["bias"] = _np(sd[f"{p}.bias"])
    return out


def _conv3d_kernel(sd: Tree, p: str) -> np.ndarray:
    # torch (out, in, D, H, W) -> flax (D, H, W, in, out)
    return _np(sd[f"{p}.weight"]).transpose(2, 3, 4, 1, 0)


def _affine(sd: Tree, p: str) -> Tree:
    """LayerNorm / GroupNorm / BN affine -> {scale,bias}."""
    return {"scale": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}


def _seq_indices(sd: Tree, prefix: str) -> list:
    """Sorted child indices i with '{prefix}.{i}.weight' present."""
    idx = set()
    plen = len(prefix) + 1
    for k in sd:
        if k.startswith(prefix + ".") and k.endswith(".weight"):
            head = k[plen:].split(".", 1)[0]
            if head.isdigit():
                idx.add(int(head))
    return sorted(idx)


def _count_children(sd: Tree, prefix: str) -> int:
    """Number of ModuleList children under '{prefix}.{i}...'."""
    idx = set()
    plen = len(prefix) + 1
    for k in sd:
        if k.startswith(prefix + "."):
            head = k[plen:].split(".", 1)[0]
            if head.isdigit():
                idx.add(int(head))
    return len(idx)


# ------------------------------------------------------ mlp-side modules

def velocity_net_from_sd(sd: Tree) -> Tree:
    """Reference VelocityNet / VelocityNetWithContext state_dict
    (models.py:82-153, 546-601) -> pcfm param tree.  Depth is inferred
    from the ``blocks.{i}`` count."""
    p = {"t_proj": _lin(sd, "t_proj"), "c_proj": _lin(sd, "c_proj"),
         "input": _lin(sd, "input"), "out": _lin(sd, "out.1")}
    for i in range(_count_children(sd, "blocks")):
        p[f"block_{i}"] = _lin(sd, f"blocks.{i}.1")
        p[f"film_{i}"] = {"norm": _affine(sd, f"films.{i}.norm"),
                          "affine": _lin(sd, f"films.{i}.affine")}
    return p


def shape_encoder_from_sd(sd: Tree) -> Tree:
    """Reference ShapeEncoder state_dict (models.py:156-187)."""
    p = {f"mlp_{i}": _lin(sd, f"mlp.{2 * i}") for i in range(3)}
    head_idx = _seq_indices(sd, "head")
    for j, i in enumerate(head_idx[:-1]):
        p[f"head_{j}"] = _lin(sd, f"head.{i}")
    p["head_out"] = _lin(sd, f"head.{head_idx[-1]}")
    return p


def latent_net_from_sd(sd: Tree) -> Tree:
    """Reference ConditionalLatentVelocityNet state_dict
    (models.py:224-275): films-free residual trunk."""
    p = {"t_proj": _lin(sd, "t_proj"), "c_proj": _lin(sd, "c_proj"),
         "input": _lin(sd, "input"), "out": _lin(sd, "out.1")}
    for i in range(_count_children(sd, "blocks")):
        p[f"block_{i}"] = _lin(sd, f"blocks.{i}.1")
    return p


# --------------------------------------------------- hybrid-side modules

def shared_mlp_from_sd(sd: Tree, p: str) -> Tuple[Tree, Tree]:
    """Reference SharedMLP (pvcnn shared_mlp.py:6-33): Sequential of
    [Conv1d, BN, ReLU] triples.  Conv bias folds into the BN mean."""
    params, stats = {}, {}
    i = 0
    while f"{p}.layers.{3 * i}.weight" in sd:
        conv, bn = f"{p}.layers.{3 * i}", f"{p}.layers.{3 * i + 1}"
        params[f"dense_{i}"] = {"kernel": _conv1d(sd, conv)["kernel"]}
        params[f"bn_{i}"] = _affine(sd, bn)
        stats[f"bn_{i}"] = {
            "mean": _np(sd[f"{bn}.running_mean"]) - _np(sd[f"{conv}.bias"]),
            "var": _np(sd[f"{bn}.running_var"])}
        i += 1
    return params, stats


def pvconv_from_sd(sd: Tree, p: str) -> Tuple[Tree, Tree]:
    """Reference PVConv (pvcnn pvconv.py:11-39): voxel_layers Sequential
    [Conv3d, BN3d, LeakyReLU] x2 (+ SE3d at index 6) + point SharedMLP."""
    params, stats = {}, {}
    for j, (ci, bi) in enumerate(((0, 1), (3, 4))):
        conv, bn = f"{p}.voxel_layers.{ci}", f"{p}.voxel_layers.{bi}"
        params[f"conv3d_{j}"] = {"kernel": _conv3d_kernel(sd, conv)}
        params[f"bn3d_{j}"] = _affine(sd, bn)
        stats[f"bn3d_{j}"] = {
            "mean": _np(sd[f"{bn}.running_mean"]) - _np(sd[f"{conv}.bias"]),
            "var": _np(sd[f"{bn}.running_var"])}
    se = f"{p}.voxel_layers.6.fc"
    if f"{se}.0.weight" in sd:                       # SE3d, bias-free
        params["se"] = {"fc1": {"kernel": _np(sd[f"{se}.0.weight"]).T},
                        "fc2": {"kernel": _np(sd[f"{se}.2.weight"]).T}}
    pf_p, pf_s = shared_mlp_from_sd(sd, f"{p}.point_features")
    params["point_features"], stats["point_features"] = pf_p, pf_s
    return params, stats


def film1d_from_sd(sd: Tree, p: str) -> Tuple[Tree, Tree]:
    """Reference _FiLM1d (models.py:322-346) -> (params, batch_stats).

    ctx_norm='group'/'none': affine-only mapping, no stats.
    ctx_norm='batch'/'syncbn' (reference maps both to plain BatchNorm1d,
    models.py:313-319): the norm's running stats land in the pcfm
    ``norm/bn`` batch_stats subtree (no bias folding — the film norm sees
    raw features, not a conv output)."""
    out: Tree = {"affine": _lin(sd, f"{p}.affine")}
    stats: Tree = {}
    if f"{p}.norm.running_mean" in sd:
        out["norm"] = {"bn": _affine(sd, f"{p}.norm")}
        stats["norm"] = {"bn": {
            "mean": _np(sd[f"{p}.norm.running_mean"]),
            "var": _np(sd[f"{p}.norm.running_var"])}}
    elif f"{p}.norm.weight" in sd:
        out["norm"] = _affine(sd, f"{p}.norm")
    return out, stats


def context_net_from_sd(sd: Tree) -> Tuple[Tree, Tree]:
    """Reference ContextNet state_dict (models.py:392-543)."""
    params = {"t_proj": _lin(sd, "t_proj"), "c_proj": _lin(sd, "c_proj"),
              "head_pre": _conv1d(sd, "head_pre"),
              "head_out": _conv1d(sd, "head_out"),
              "ctx_from_emb": _lin(sd, "ctx_from_emb.0")}
    stats: Tree = {}
    if "head_norm.running_mean" in sd:     # ctx_norm='batch'/'syncbn'
        params["head_norm"] = {"bn": _affine(sd, "head_norm")}
        stats["head_norm"] = {"bn": {
            "mean": _np(sd["head_norm.running_mean"]),
            "var": _np(sd["head_norm.running_var"])}}
    elif "head_norm.weight" in sd:
        params["head_norm"] = _affine(sd, "head_norm")
    if "global_mlp.0.weight" in sd:
        params["global_0"] = _lin(sd, "global_mlp.0")
        params["global_1"] = _lin(sd, "global_mlp.2")
    for si in range(_count_children(sd, "stages")):
        sp_p, sp_s = shared_mlp_from_sd(sd, f"stages.{si}.proj")
        stage_p: Tree = {"proj": sp_p}
        stage_s: Tree = {"proj": sp_s}
        for bi in range(_count_children(sd, f"stages.{si}.blocks")):
            b = f"stages.{si}.blocks.{bi}"
            pv_p, pv_s = pvconv_from_sd(sd, f"{b}.pvconv")
            po_p, po_s = shared_mlp_from_sd(sd, f"{b}.post")
            fm_p, fm_s = film1d_from_sd(sd, f"{b}.film")
            stage_p[f"block_{bi}"] = {"pvconv": pv_p, "post": po_p,
                                      "film": fm_p}
            stage_s[f"block_{bi}"] = {"pvconv": pv_s, "post": po_s}
            if fm_s:
                stage_s[f"block_{bi}"]["film"] = fm_s
        params[f"stage_{si}"] = stage_p
        stats[f"stage_{si}"] = stage_s
    return params, stats


def hybrid_from_sd(sd: Tree) -> Tuple[Tree, Tree]:
    """Reference HybridMLP state_dict (models.py:604-694): ``ctx_net.*``
    ContextNet + ``head.*`` VelocityNetWithContext."""
    ctx_sd = {k[len("ctx_net."):]: v for k, v in sd.items()
              if k.startswith("ctx_net.")}
    head_sd = {k[len("head."):]: v for k, v in sd.items()
               if k.startswith("head.")}
    ctx_p, ctx_s = context_net_from_sd(ctx_sd)
    return ({"ctx_net": ctx_p, "head": velocity_net_from_sd(head_sd)},
            {"ctx_net": ctx_s})


def pf_from_sd(sd: Tree, backbone: str) -> Tuple[Tree, Tree]:
    if backbone == "hybrid":
        return hybrid_from_sd(sd)
    return velocity_net_from_sd(sd), {}


# ------------------------------------------------------------- config

def config_from_reference_args(args: Dict[str, Any],
                               cond_dim: Optional[int] = None,
                               **overrides) -> Config:
    """Build a pcfm Config from the ``args`` dict stored in a reference
    checkpoint.  Field names match the reference CLI 1:1 (pcfm/config.py);
    unknown reference keys are dropped.  The ContextNet precision island
    defaults to fp32 — the torch checkpoint was trained with the exact
    fp32 island (reference models.py:513)."""
    fields = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in args.items() if k in fields}
    if cond_dim is not None:
        kw["cond_dim"] = int(cond_dim)
    kw.setdefault("ctx_dtype", "fp32")
    kw.update(overrides)
    return Config(**kw)


# ------------------------------------------------------------- assembly

def _like(template, tree, where: str):
    """Cast ``tree`` leaves onto ``template``'s dtypes after checking the
    two trees have identical structure and leaf shapes."""
    t_flat = jax.tree_util.tree_flatten_with_path(template)[0]
    n_flat = dict(jax.tree_util.tree_flatten_with_path(tree)[0])
    t_keys = {jax.tree_util.keystr(k) for k, _ in t_flat}
    n_keys = {jax.tree_util.keystr(k) for k, _ in n_flat.items()}
    if t_keys != n_keys:
        missing = sorted(t_keys - n_keys)[:8]
        extra = sorted(n_keys - t_keys)[:8]
        raise ValueError(f"{where}: tree mismatch vs init_state; "
                         f"missing={missing} extra={extra}")

    def cast(path, ref):
        leaf = n_flat[path]
        if tuple(ref.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"{where}{jax.tree_util.keystr(path)}: shape "
                f"{np.shape(leaf)} != expected {tuple(ref.shape)}")
        return np.asarray(leaf, dtype=ref.dtype)

    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template),
        [cast(p, r) for p, r in t_flat])


def state_from_reference_ckpt(ckpt: Dict[str, Any], cfg: Config):
    """Build (bundle, TrainState, tx) with params/stats/EMA transplanted
    from a loaded reference checkpoint dict."""
    from pcfm.train.state import init_state

    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(cfg.seed),
                                   total_steps=max(1, cfg.epochs))

    def host_sd(d):
        return _unwrap_ddp({k: _np(v) for k, v in d.items()})

    pf_p, pf_s = pf_from_sd(host_sd(ckpt["pf"]), cfg.pf_backbone)
    params = dict(state.params)
    params["enc"] = shape_encoder_from_sd(host_sd(ckpt["encoder"]))
    params["pf"] = pf_p
    params["lf"] = latent_net_from_sd(host_sd(ckpt["lf"]))

    batch_stats = dict(state.batch_stats) if state.batch_stats else {}
    if pf_s:
        batch_stats["pf"] = pf_s

    # EMA shadows are keyed exactly like the live state_dicts (reference
    # util.py:11-24 registers every float entry, incl. BN running stats).
    ema_pf, ema_lf = state.ema_pf, state.ema_lf
    if ckpt.get("ema_pf"):
        e_p, e_s = pf_from_sd(host_sd(ckpt["ema_pf"]), cfg.pf_backbone)
        ema_pf = {"params": e_p, "batch_stats": e_s or
                  state.ema_pf.get("batch_stats", {})}
    else:
        ema_pf = {"params": pf_p, "batch_stats": pf_s or
                  state.ema_pf.get("batch_stats", {})}
    if ckpt.get("ema_lf"):
        ema_lf = {"params": latent_net_from_sd(host_sd(ckpt["ema_lf"])),
                  "batch_stats": state.ema_lf.get("batch_stats", {})}
    else:
        ema_lf = {"params": params["lf"],
                  "batch_stats": state.ema_lf.get("batch_stats", {})}

    state = state.replace(
        params=_like(state.params, params, "params"),
        batch_stats=_like(state.batch_stats, batch_stats, "batch_stats"),
        ema_pf=_like(state.ema_pf, ema_pf, "ema_pf"),
        ema_lf=_like(state.ema_lf, ema_lf, "ema_lf"),
        step=np.int32(ckpt.get("global_step", 0) or 0))
    return bundle, state, tx


def import_reference_checkpoint(path: str, out_dir: str,
                                **cfg_overrides) -> Tuple[str, Config]:
    """Load a reference ``hybrid_epNNNN.pt`` and write a pcfm checkpoint
    under ``{out_dir}/ckpts/`` that train/sample/eval CLIs pick up.
    Returns (checkpoint_path, Config)."""
    import torch

    from pcfm.train import checkpoint as ckpt_io

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    args = dict(ckpt.get("args", {}))
    cfg = config_from_reference_args(
        args, cond_dim=ckpt.get("cond_dim", args.get("cond_dim")),
        out_dir=out_dir, **cfg_overrides)
    _, state, _ = state_from_reference_ckpt(ckpt, cfg)
    epoch = int(ckpt.get("epoch", 0) or 0)
    saved = ckpt_io.save(out_dir, epoch, state, cfg, async_save=False)
    return saved, cfg
