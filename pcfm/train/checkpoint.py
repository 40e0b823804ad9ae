"""Checkpoint save / auto-resume.

Reference behavior (train.py:432-538, 682-708): rank-0 save of
``hybrid_ep{ep:04d}`` per save_every epochs containing the three model
states, two EMA shadows, optimizer, scaler, args and global_step; resume by
regex-scanning for the max epoch.  Here the whole TrainState pytree (params
+ batch_stats + opt_state + EMA + step) is one orbax checkpoint plus a
JSON sidecar with the config and epoch.
"""
from __future__ import annotations

import json
import os
import re
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from pcfm.config import Config
from pcfm.train.state import TrainState

_CKPT_RE = re.compile(r"hybrid_ep(\d+)$")


def ckpt_dir(out_dir: str) -> str:
    return os.path.join(os.path.abspath(out_dir), "ckpts")


def find_latest(out_dir: str) -> Tuple[Optional[str], int]:
    """Return (path, epoch) of the newest checkpoint, or (None, 0)
    (train.py:438-450)."""
    d = ckpt_dir(out_dir)
    if not os.path.isdir(d):
        return None, 0
    best_ep, best_path = 0, None
    for fn in os.listdir(d):
        m = _CKPT_RE.match(fn)
        if m and int(m.group(1)) > best_ep:
            best_ep = int(m.group(1))
            best_path = os.path.join(d, fn)
    return best_path, best_ep


def save(out_dir: str, epoch: int, state: TrainState, cfg: Config):
    d = ckpt_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"hybrid_ep{epoch:04d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"),
                   jax.device_get(state), force=True)
    meta = {"epoch": int(epoch), "global_step": int(state.step),
            "config": json.loads(cfg.to_json())}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def restore(path: str, state: TrainState) -> Tuple[TrainState, dict]:
    """Restore into the structure of ``state`` (must be built from the same
    config).  Returns (state, meta)."""
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.join(os.path.abspath(path), "state"),
                                 abstract)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return restored, meta


def auto_resume(out_dir: str, state: TrainState,
                verbose: bool = True) -> Tuple[TrainState, int, int]:
    """Scan for the newest checkpoint and restore it.

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
    state, meta = restore(path, state)
    last_epoch = int(meta.get("epoch", ep))
    gs = int(meta.get("global_step", 0))
    if verbose:
        print(f"[Auto-Resume] Resume from epoch {last_epoch}.")
    return state, last_epoch + 1, gs
