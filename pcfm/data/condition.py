"""TDCR tendon-robot motor conditioning — numpy port of the reference
`condition.py:19-87` (encode_motors / get_cond_dim).

Per-segment resultant-vector geometry features over 2 or 3 segments of 3
tendons each, with the reference's phase basis (180, 300, 60 deg) and
[0,1] normalization by max_pos.
"""
from __future__ import annotations

import numpy as np


def _module_resultant(m123: np.ndarray, angles_deg, offset_deg: float = 0.0):
    th = np.deg2rad(np.asarray(angles_deg, dtype=np.float32)
                    + float(offset_deg))
    c = np.stack([np.cos(th), np.sin(th)], axis=0)                  # (2,3)
    vec = c @ m123.astype(np.float32)                               # (2,)
    total = float(np.sum(m123))
    mean = total / 3.0 if total > 0 else 0.0
    amp = float(np.sqrt(np.mean((m123 - mean) ** 2)))
    return vec.astype(np.float32), total, amp


def encode_motors(motors: np.ndarray, enc_mode: str = "raw6+geom",
                  mod2_offset_deg: float = 0.0, max_pos: float = 0.04,
                  mod3_offset_deg: float = 0.0) -> np.ndarray:
    m = np.asarray(motors, dtype=np.float32).reshape(-1)
    assert m.shape[0] in (6, 9), f"motors dim must be 6 or 9, got {m.shape[0]}"
    nseg = 2 if m.shape[0] == 6 else 3

    mn = (m / float(max_pos)).clip(0.0, 1.0).astype(np.float32)
    base_angles = [180.0, 300.0, 60.0]

    v1, t1, a1 = _module_resultant(mn[0:3], base_angles, 0.0)
    v2 = np.zeros(2, np.float32); t2 = 0.0; a2 = 0.0
    v3 = np.zeros(2, np.float32); t3 = 0.0; a3 = 0.0
    if nseg >= 2:
        v2, t2, a2 = _module_resultant(mn[3:6], base_angles, mod2_offset_deg)
    if nseg == 3:
        v3, t3, a3 = _module_resultant(mn[6:9], base_angles, mod3_offset_deg)

    if nseg == 2:
        geom = np.concatenate([v1, [t1, a1], v2, [t2, a2],
                               [t1 - t2, t1 + t2]]).astype(np.float32)  # 10-d
        if enc_mode == "raw6":
            return mn
        if enc_mode == "geom":
            return geom
        if enc_mode == "raw6+geom":
            return np.concatenate([mn, geom]).astype(np.float32)
        raise ValueError(f"unknown enc_mode={enc_mode} for 2-seg")
    else:
        geom3 = np.concatenate([v1, [t1, a1], v2, [t2, a2], v3, [t3, a3],
                                [t1 - t2, t2 - t3, t1 - t3, t1 + t2 + t3]]
                               ).astype(np.float32)                      # 16-d
        if enc_mode == "raw9":
            return mn
        if enc_mode == "geom3":
            return geom3
        if enc_mode == "raw9+geom3":
            return np.concatenate([mn, geom3]).astype(np.float32)        # 25-d
        raise ValueError(f"unknown enc_mode={enc_mode} for 3-seg")


def get_cond_dim(enc_mode: str) -> int:
    table = {"raw6": 6, "geom": 10, "raw6+geom": 16,
             "raw9": 9, "geom3": 16, "raw9+geom3": 25}
    if enc_mode in table:
        return table[enc_mode]
    n = 9 if (("raw9" in enc_mode) or ("geom3" in enc_mode)) else 6
    return int(encode_motors(np.zeros(n, np.float32), enc_mode).shape[0])
