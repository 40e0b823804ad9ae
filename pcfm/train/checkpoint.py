"""Checkpoint save / auto-resume.

Reference behavior (train.py:432-538, 682-708): rank-0 save of
``hybrid_ep{ep:04d}`` per save_every epochs containing the three model
states, two EMA shadows, optimizer, scaler, args and global_step; resume by
regex-scanning for the max epoch.  Here the whole TrainState pytree (params
+ batch_stats + opt_state + EMA + step) is one orbax checkpoint plus a
JSON sidecar with the config and epoch.

Reference-parity restore semantics (train.py:459-516):
  * non-strict model load — keys present in the checkpoint overwrite the
    fresh state, everything else keeps its fresh initialization
    (``pf.load_state_dict(..., strict=False)``);
  * EMA key-union — the CURRENT shadow is the full key set; overlapping
    checkpoint keys override (``_safe_load_ema``);
  * optimizer state is restored all-or-nothing with a warning on failure
    (``try: opt.load_state_dict(...) except: warn``);
  * legacy top-level key remap (``model``->pf, ``opt_main``->opt).
``restore_tolerant`` reproduces all four on the JAX pytree.

Beyond reference: saves are asynchronous (orbax AsyncCheckpointer — the
device->host copy happens synchronously but serialization overlaps the next
training steps) and old checkpoints are garbage-collected to the newest K
(``keep_last_ckpts``).
"""
from __future__ import annotations

import atexit
import json
import os
import re
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from pcfm.config import Config
from pcfm.train.state import TrainState

_CKPT_RE = re.compile(r"hybrid_ep(\d+)$")

# Legacy field renames (reference train.py:487,504: "model"->pf,
# "opt_main"->opt): applied to the first path component of raw checkpoints.
LEGACY_KEY_MAP = {"opt_main": "opt_state", "model": "params"}

_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _mp_options() -> dict:
    """Confine orbax's internal barriers to the calling process.

    The reference saves on rank 0 only (train.py:682-706); here save() is
    likewise called on rank 0 alone, but orbax's default
    MultiprocessingOptions spans ALL processes and its sync_global_devices
    barrier would deadlock/mismatch against whatever collective the other
    ranks are running (observed: gloo size-mismatch abort in the 2-process
    loop test).  Restores are read-only and also safe per-process."""
    if jax.process_count() > 1:
        me = jax.process_index()
        return {"multiprocessing_options": ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me},
            barrier_sync_key_prefix=f"proc{me}")}
    return {}


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler(),
                                             **_mp_options())
        atexit.register(_ASYNC_CKPTR.wait_until_finished)
    return _ASYNC_CKPTR


def wait_for_saves():
    """Block until any in-flight async save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def ckpt_dir(out_dir: str) -> str:
    return os.path.join(os.path.abspath(out_dir), "ckpts")


def _is_complete(path: str) -> bool:
    """A finalized checkpoint has its atomically-renamed ``state`` dir."""
    return os.path.isdir(os.path.join(path, "state"))


def find_latest(out_dir: str) -> Tuple[Optional[str], int]:
    """Return (path, epoch) of the newest COMPLETE checkpoint, or (None, 0)
    (train.py:438-450).  Blocks on any in-flight async save first — a
    same-process save-then-scan (e.g. auto_resume right after a save)
    must see the committed directory."""
    wait_for_saves()
    d = ckpt_dir(out_dir)
    if not os.path.isdir(d):
        return None, 0
    best_ep, best_path = 0, None
    for fn in os.listdir(d):
        m = _CKPT_RE.match(fn)
        p = os.path.join(d, fn)
        if m and int(m.group(1)) > best_ep and _is_complete(p):
            best_ep = int(m.group(1))
            best_path = p
    return best_path, best_ep


def gc_old(out_dir: str, keep_last: int):
    """Delete all but the newest ``keep_last`` complete checkpoints
    (no-op when keep_last <= 0)."""
    if keep_last <= 0:
        return
    d = ckpt_dir(out_dir)
    if not os.path.isdir(d):
        return
    eps = sorted((int(m.group(1)), os.path.join(d, fn))
                 for fn in os.listdir(d)
                 if (m := _CKPT_RE.match(fn)) and
                 _is_complete(os.path.join(d, fn)))
    for _, p in eps[:-keep_last]:
        shutil.rmtree(p, ignore_errors=True)


def save(out_dir: str, epoch: int, state: TrainState, cfg: Config,
         async_save: bool = True):
    d = ckpt_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"hybrid_ep{epoch:04d}")
    os.makedirs(path, exist_ok=True)
    meta = {"epoch": int(epoch), "global_step": int(state.step),
            "config": json.loads(cfg.to_json())}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    host_state = jax.device_get(state)
    if async_save:
        ckptr = _async_ckptr()
        ckptr.wait_until_finished()        # at most one save in flight
        ckptr.save(os.path.join(path, "state"), args=ocp.args.StandardSave(
            host_state), force=True)
    else:
        with ocp.StandardCheckpointer(**_mp_options()) as ckptr:
            ckptr.save(os.path.join(path, "state"), host_state, force=True)
    keep = int(getattr(cfg, "keep_last_ckpts", 0) or 0)
    if keep > 0:
        # the in-flight save's dir already counts as complete only after
        # commit; older completes beyond K-1 can go now
        gc_old(out_dir, keep)
    return path


def restore(path: str, state: TrainState) -> Tuple[TrainState, dict]:
    """Strict restore into the structure of ``state`` (must be built from
    the same config).  Returns (state, meta)."""
    wait_for_saves()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state)
    try:
        with ocp.StandardCheckpointer(**_mp_options()) as ckptr:
            restored = ckptr.restore(
                os.path.join(os.path.abspath(path), "state"), abstract)
    except Exception as e:  # noqa: BLE001 — re-raise with actionable hint
        if "opt_state" in str(e):
            # RuntimeError, not type(e): orbax exception classes may not
            # accept a single-str constructor (review r3 finding)
            raise RuntimeError(
                f"{e}\n[pcfm] The checkpoint's optimizer-state tree does "
                "not match this run's. Most likely the checkpoint was "
                "trained with the other optimizer backend "
                "(cfg.flat_optimizer flipped default to True in r2) — "
                "retry with --no_flat_optimizer (or --flat_optimizer), or "
                "use the tolerant auto-resume path which resets the "
                "optimizer state instead.") from e
        raise
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return restored, meta


def _path_key(entry) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def _flatten(tree) -> Dict[Tuple[str, ...], Any]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {tuple(_path_key(e) for e in p): leaf for p, leaf in flat}


def restore_tolerant(path: str, state: TrainState,
                     verbose: bool = True) -> Tuple[TrainState, dict, dict]:
    """Non-strict restore: merge whatever matches, keep fresh init for the
    rest (reference train.py:459-516 semantics — see module docstring).

    Returns (state, meta, report) where report lists ``loaded``, ``missing``
    (kept fresh), ``unexpected`` (ignored ckpt keys) and ``opt_reset``.
    """
    wait_for_saves()
    with ocp.StandardCheckpointer(**_mp_options()) as ckptr:
        raw = ckptr.restore(os.path.join(os.path.abspath(path), "state"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)

    raw_flat = {}
    for p, leaf in _flatten(raw).items():
        if p and p[0] in LEGACY_KEY_MAP:
            p = (LEGACY_KEY_MAP[p[0]],) + p[1:]
        raw_flat[p] = leaf

    tgt_flat = _flatten(state)
    report: Dict[str, List[str]] = {"loaded": [], "missing": [],
                                    "unexpected": [], "opt_reset": False}
    merged: Dict[Tuple[str, ...], Any] = {}
    opt_ok = True
    for p, tl in tgt_flat.items():
        rl = raw_flat.get(p)
        t_shape = tuple(np.shape(tl))
        if rl is not None and tuple(np.shape(rl)) == t_shape:
            merged[p] = jnp.asarray(rl, dtype=np.asarray(tl).dtype
                                    if not hasattr(tl, "dtype") else tl.dtype)
            report["loaded"].append("/".join(p))
        else:
            merged[p] = tl
            report["missing"].append("/".join(p))
            if p and p[0] == "opt_state":
                opt_ok = False
    for p in raw_flat:
        if p not in tgt_flat:
            report["unexpected"].append("/".join(p))

    if not opt_ok:
        # all-or-nothing optimizer state (reference's try/except opt load):
        # a partially-merged Adam state is silently wrong, so reset it whole
        for p, tl in tgt_flat.items():
            if p and p[0] == "opt_state":
                merged[p] = tl
        report["opt_reset"] = True

    _, treedef = jax.tree_util.tree_flatten(state)
    order = list(_flatten(state).keys())
    new_state = jax.tree_util.tree_unflatten(
        treedef, [merged[p] for p in order])

    if verbose:
        nl, nm, nu = (len(report["loaded"]), len(report["missing"]),
                      len(report["unexpected"]))
        print(f"[Auto-Resume] tolerant restore: {nl} loaded, "
              f"{nm} kept fresh, {nu} ignored"
              + (", optimizer state RESET" if report["opt_reset"] else ""))
        for k in report["missing"][:8]:
            print(f"[Auto-Resume][WARN] kept fresh: {k}")
    return new_state, meta, report


def auto_resume(out_dir: str, state: TrainState,
                verbose: bool = True) -> Tuple[TrainState, int, int]:
    """Scan for the newest checkpoint and restore it (tolerantly — resuming
    survives config field additions and width changes, keeping fresh init
    for mismatched subtrees).

    Returns (state, start_epoch, global_step); start_epoch is 1 when no
    checkpoint exists.
    """
    path, ep = find_latest(out_dir)
    if path is None:
        if verbose:
            print("[Auto-Resume] No checkpoint found. "
                  "Start training from scratch.")
        return state, 1, 0
    if verbose:
        print(f"[Auto-Resume] Found latest ckpt: {path} (ep={ep})")
    state, meta, _ = restore_tolerant(path, state, verbose=verbose)
    last_epoch = int(meta.get("epoch", ep))
    gs = int(meta.get("global_step", 0))
    if verbose:
        print(f"[Auto-Resume] Resume from epoch {last_epoch}.")
    return state, last_epoch + 1, gs
