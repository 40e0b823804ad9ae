"""Pure-numpy oracles mirroring the reference CUDA kernel semantics.

These are independent reimplementations (loop-level, float64 where the
reference python oracle uses double) used as parity targets for the JAX/
Pallas ops — the same discipline as the reference's
`ChamferDistancePytorch/unit_test.py` and `chamfer_python.py`.
"""
from __future__ import annotations

import numpy as np


def avg_voxelize_np(features: np.ndarray, coords: np.ndarray, r: int):
    """features (B,N,C) float, coords (B,N,3) int -> (B,R,R,R,C)."""
    b, n, c = features.shape
    out = np.zeros((b, r * r * r, c), np.float64)
    cnt = np.zeros((b, r * r * r), np.int64)
    for bi in range(b):
        for i in range(n):
            x, y, z = coords[bi, i]
            f = (x * r + y) * r + z
            out[bi, f] += features[bi, i]
            cnt[bi, f] += 1
    nz = cnt > 0
    out[nz] /= cnt[nz][:, None]
    return out.reshape(b, r, r, r, c).astype(np.float32)


def trilinear_devoxelize_np(grid: np.ndarray, coords: np.ndarray, r: int):
    """grid (B,R,R,R,C), coords (B,N,3) float in [0,R-1] -> (B,N,C).
    Reproduces the CUDA boundary trick (hi collapses to lo at frac==0)."""
    b, n, _ = coords.shape
    c = grid.shape[-1]
    flat = grid.reshape(b, -1, c)
    out = np.zeros((b, n, c), np.float64)
    for bi in range(b):
        for i in range(n):
            x, y, z = coords[bi, i]
            lo = np.floor([x, y, z])
            fr = np.array([x, y, z]) - lo
            lo = lo.astype(int)
            hi = lo + (fr > 0)
            for sx in (0, 1):
                for sy in (0, 1):
                    for sz in (0, 1):
                        ix = hi[0] if sx else lo[0]
                        iy = hi[1] if sy else lo[1]
                        iz = hi[2] if sz else lo[2]
                        w = ((fr[0] if sx else 1 - fr[0])
                             * (fr[1] if sy else 1 - fr[1])
                             * (fr[2] if sz else 1 - fr[2]))
                        out[bi, i] += w * flat[bi, (ix * r + iy) * r + iz]
    return out.astype(np.float32)


def chamfer_np(a: np.ndarray, b: np.ndarray):
    """float64 pairwise oracle (mirrors chamfer_python.distChamfer)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    d2 = (np.sum(a**2, -1)[:, :, None] + np.sum(b**2, -1)[:, None, :]
          - 2 * np.einsum("bnd,bmd->bnm", a, b))
    return (d2.min(2).astype(np.float32), d2.min(1).astype(np.float32),
            d2.argmin(2).astype(np.int32), d2.argmin(1).astype(np.int32))


def approxmatch_np(xyz1: np.ndarray, xyz2: np.ndarray):
    """Loop-level float64 port of emd_kernel.cu approxmatch -> (B,M,N)."""
    xyz1 = xyz1.astype(np.float64)
    xyz2 = xyz2.astype(np.float64)
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if n >= m:
        mult_l, mult_r = 1.0, float(n // m)
    else:
        mult_l, mult_r = float(m // n), 1.0
    d2 = (np.sum(xyz1**2, -1)[:, :, None] + np.sum(xyz2**2, -1)[:, None, :]
          - 2 * np.einsum("bnd,bmd->bnm", xyz1, xyz2))
    match = np.zeros((b, n, m))
    remain_l = np.full((b, n), mult_l)
    remain_r = np.full((b, m), mult_r)
    levels = [-(4.0 ** j) for j in range(7, -2, -1)] + [0.0]
    for level in levels:
        w = np.exp(level * d2)
        suml = 1e-9 + np.einsum("bnm,bm->bn", w, remain_r)
        ratio_l = remain_l / suml
        sumr = np.einsum("bnm,bn->bm", w, ratio_l) * remain_r
        consumption = np.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = np.maximum(0.0, remain_r - sumr)
        delta = w * ratio_l[:, :, None] * ratio_r[:, None, :]
        match += delta
        remain_l = np.maximum(0.0, remain_l - delta.sum(2))
    return np.swapaxes(match, 1, 2)


def emd_np(xyz1: np.ndarray, xyz2: np.ndarray):
    match = approxmatch_np(xyz1, xyz2)
    d2 = (np.sum(xyz1.astype(np.float64)**2, -1)[:, :, None]
          + np.sum(xyz2.astype(np.float64)**2, -1)[:, None, :]
          - 2 * np.einsum("bnd,bmd->bnm", xyz1.astype(np.float64),
                          xyz2.astype(np.float64)))
    cost = np.einsum("bnm,bmn->b", d2, match)
    return (cost / xyz1.shape[1]).astype(np.float32)


def fps_np(coords: np.ndarray, m: int):
    """(B,N,3) -> (B,M) int, sequential oracle (first index 0)."""
    b, n, _ = coords.shape
    idxs = np.zeros((b, m), np.int32)
    for bi in range(b):
        dists = np.full(n, 1e40)
        old = 0
        for j in range(1, m):
            d = np.sum((coords[bi] - coords[bi, old]) ** 2, -1)
            dists = np.minimum(dists, d)
            old = int(np.argmax(dists))
            idxs[bi, j] = old
    return idxs


def ball_query_np(centers: np.ndarray, points: np.ndarray, radius: float,
                  u: int):
    """(B,M,3),(B,N,3) -> (B,M,U) int with back-fill semantics."""
    b, m, _ = centers.shape
    n = points.shape[1]
    out = np.zeros((b, m, u), np.int32)
    r2 = radius * radius
    for bi in range(b):
        for j in range(m):
            cnt = 0
            for k in range(n):
                if cnt >= u:
                    break
                d2 = np.sum((centers[bi, j] - points[bi, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        out[bi, j, :] = k
                    out[bi, j, cnt] = k
                    cnt += 1
    return out


def three_nn_interp_np(points: np.ndarray, centers: np.ndarray,
                       feats: np.ndarray):
    """(B,N,3),(B,M,3),(B,M,C) -> (B,N,C), insertion-scan 3-NN oracle."""
    b, n, _ = points.shape
    c = feats.shape[-1]
    out = np.zeros((b, n, c), np.float64)
    for bi in range(b):
        for i in range(n):
            best = [1e40, 1e40, 1e40]
            besti = [0, 0, 0]
            for k in range(centers.shape[1]):
                d = float(np.sum((points[bi, i] - centers[bi, k]) ** 2))
                if d < best[2]:
                    best[2], besti[2] = d, k
                    if d < best[1]:
                        best[2], besti[2] = best[1], besti[1]
                        best[1], besti[1] = d, k
                        if d < best[0]:
                            best[1], besti[1] = best[0], besti[0]
                            best[0], besti[0] = d, k
            d0, d1, d2 = [max(min(1e10, x), 1e-10) for x in best]
            s = d0 * d1 + d0 * d2 + d1 * d2
            w = [d1 * d2 / s, d0 * d2 / s, d0 * d1 / s]
            for t in range(3):
                out[bi, i] += w[t] * feats[bi, besti[t]]
    return out.astype(np.float32)
