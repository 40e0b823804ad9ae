"""Evaluation metrics over datasets: CD / EMD / F-score.

The reference evaluates via README smoke snippets + train-time prints
(SURVEY.md §4); here it is a first-class API that batches over a whole test
set, optionally sharded across devices on the batch axis.
"""
from __future__ import annotations

import functools
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pcfm.ops.chamfer import chamfer_distance, fscore
from pcfm.ops.emd import earth_mover_distance, earth_mover_distance_streamed


@functools.lru_cache(maxsize=None)
def _pick_chunk(n: int, m: int, target: int = 2048) -> int:
    """Largest common divisor chunk of (n, m) not exceeding target."""
    best = 1
    for c in range(1, min(target, n, m) + 1):
        if n % c == 0 and m % c == 0:
            best = c
    return best


def cloud_metrics(pred: jax.Array, gt: jax.Array,
                  emd_max_points: int = 4096,
                  fscore_threshold: float = 0.001,
                  key: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Per-cloud metrics between (B,N,3[+]) predictions and GT.

    EMD cost is O(N*M) memory (the approxmatch match matrix — the reference
    CUDA kernel has the same footprint, emd_kernel.cu:182), so clouds larger
    than ``emd_max_points`` are randomly subsampled for EMD only.
    """
    pxyz = pred[..., :3].astype(jnp.float32)
    gxyz = gt[..., :3].astype(jnp.float32)
    d1, d2, _, _ = chamfer_distance(pxyz, gxyz)
    cd = jnp.mean(d1, axis=1) + jnp.mean(d2, axis=1)
    f, p1, p2 = fscore(d1, d2, threshold=fscore_threshold)

    n, m = pxyz.shape[1], gxyz.shape[1]
    if max(n, m) > emd_max_points:
        # large clouds: the streamed O(N+M)-memory formulation evaluates the
        # FULL clouds (the reference materializes the match matrix and
        # cannot); chunk must divide both N and M
        chunk = _pick_chunk(n, m)
        if chunk >= 256:
            emd = earth_mover_distance_streamed(pxyz, gxyz, chunk=chunk)
            return {"cd": cd, "emd": emd, "fscore": f,
                    "precision": p1, "recall": p2}
        # awkward sizes: fall back to random subsampling.  Default key is
        # derived from the cloud bits — deterministic (same inputs -> same
        # subsample, reproducible evals) but de-correlated across inputs
        # (a fixed PRNGKey(0) made every keyless caller subsample the
        # same point indices, coupling their EMD estimates).
        if key is None:
            mix = jax.lax.bitcast_convert_type(
                (jnp.sum(pxyz[:, 0]) + jnp.sum(gxyz[:, 0]))
                .astype(jnp.float32), jnp.int32)
            key = jax.random.fold_in(jax.random.PRNGKey(0), mix)
        k1, k2 = jax.random.split(key)
        if n > emd_max_points:
            idx = jax.random.choice(k1, n, (emd_max_points,), replace=False)
            pxyz = pxyz[:, idx]
        if m > emd_max_points:
            idx = jax.random.choice(k2, m, (emd_max_points,), replace=False)
            gxyz = gxyz[:, idx]
    emd = earth_mover_distance(pxyz, gxyz)
    return {"cd": cd, "emd": emd, "fscore": f,
            "precision": p1, "recall": p2}


def aggregate(metric_batches: Iterable[Dict[str, jax.Array]]) -> Dict[str, float]:
    sums: Dict[str, float] = {}
    count = 0
    for mb in metric_batches:
        b = int(np.asarray(mb["cd"]).shape[0])
        count += b
        for k, v in mb.items():
            sums[k] = sums.get(k, 0.0) + float(jnp.sum(v))
    return {k: v / max(1, count) for k, v in sums.items()}


# ---------------------------------------------------------------------------
# Generative-quality suite: MMD / Coverage / 1-NN accuracy
# (beyond the reference — the standard PointFlow/ShapeGF protocol for
# comparing a SET of generated clouds against a SET of references; the
# reference repo only ever reports paired CD on a fixed val batch.)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _matrix_fn(metric: str):
    """Jitted full-matrix builder for one distance metric.

    Module-level cache: the per-call closures of the old formulation each
    carried their own jit cache (recompile per suite eval), and — far
    worse over the axon dev tunnel — its per-(row, block) host readbacks
    cost ~65 ms of round-trip latency each: a 192-cloud suite issued
    ~14k of them across its three matrices (~10-15 min of pure latency,
    the dominant cost of every gen-quality run 4-7).  One lax.map'd
    device call + ONE readback per matrix replaces them; the per-pair
    math is unchanged.
    """
    if metric == "cd":
        def pair_block_fn(x, ys):
            xs = jnp.broadcast_to(x[None], (ys.shape[0],) + x.shape)
            d1, d2, _, _ = chamfer_distance(xs, ys)
            return jnp.mean(d1, axis=1) + jnp.mean(d2, axis=1)
    elif metric == "emd":
        from pcfm.ops.emd import earth_mover_distance

        def pair_block_fn(x, ys):
            xs = jnp.broadcast_to(x[None], (ys.shape[0],) + x.shape)
            return earth_mover_distance(xs, ys)
    else:
        raise ValueError(f"unknown metric '{metric}'")

    @jax.jit
    def all_rows(a, bblk):
        # bblk (nblk, pair_block, M, 3); sequential maps bound live memory
        # to one (pair_block, N, M) distance block while the TPU stays
        # busy inside a single dispatch
        def row(x):
            return jax.lax.map(lambda ys: pair_block_fn(x, ys),
                               bblk).reshape(-1)
        return jax.lax.map(row, a)

    return all_rows


def cd_matrix(a: jax.Array, b: jax.Array, pair_block: int = 8,
              metric: str = "cd") -> np.ndarray:
    """Pairwise cloud-distance matrix between sets.

    a (Ga, N, 3), b (Gb, M, 3) -> (Ga, Gb) float64 numpy.
    metric="cd": mean(min-d2 a->b) + mean(min-d2 b->a) (the train-time
    chamfer_l2 convention, train.py:80-84); metric="emd": approxmatch
    EMD cost / N (PyTorchEMD emd.py:27-51 convention).
    """
    a = jnp.asarray(a[..., :3], jnp.float32)
    b = jnp.asarray(b[..., :3], jnp.float32)
    ga, gb = a.shape[0], b.shape[0]
    pad = (-gb) % pair_block
    bp = jnp.concatenate([b, jnp.broadcast_to(b[-1:],
                                              (pad,) + b.shape[1:])]) \
        if pad else b
    bblk = bp.reshape(bp.shape[0] // pair_block, pair_block, *b.shape[1:])
    rows = _matrix_fn(metric)(a, bblk)            # one device call
    return np.asarray(rows)[:, :gb].astype(np.float64)


def generative_metrics(gen: jax.Array, ref: jax.Array,
                       pair_block: int = 8,
                       metrics: tuple = ("cd",)) -> Dict[str, float]:
    """MMD / COV / 1-NNA between generated and reference sets, per
    distance metric in ``metrics`` ("cd" and/or "emd").

    * MMD (quality): mean over REFERENCE clouds of the distance to their
      nearest generated cloud — lower is better.
    * COV (diversity): fraction of reference clouds that are the nearest
      neighbor of at least one generated cloud — higher is better.
    * 1-NNA (both): leave-one-out 1-NN two-sample classification accuracy
      over the union — 0.5 is ideal (sets indistinguishable).
    """
    out: Dict[str, float] = {}
    for m in metrics:
        d_gr = cd_matrix(gen, ref, pair_block, metric=m)      # (G, R)
        out[f"mmd_{m}"] = float(d_gr.min(axis=0).mean())
        out[f"cov_{m}"] = float(len(np.unique(d_gr.argmin(axis=1)))
                                / d_gr.shape[1])

        d_gg = cd_matrix(gen, gen, pair_block, metric=m)
        d_rr = cd_matrix(ref, ref, pair_block, metric=m)
        np.fill_diagonal(d_gg, np.inf)
        np.fill_diagonal(d_rr, np.inf)
        # nearest same-set vs cross-set distance per sample
        correct = (d_gg.min(axis=1) < d_gr.min(axis=1)).sum() \
            + (d_rr.min(axis=1) < d_gr.min(axis=0)).sum()
        n = d_gr.shape[0] + d_gr.shape[1]
        p = float(correct / n)
        out[f"nna_{m}"] = p
        # instrument noise for the headline metric: binomial standard
        # error over the n leave-one-out classifications (treats them as
        # independent — an approximation; the measured run-to-run spread
        # on the 96-cloud protocol, ~±0.03, matches 1 SE at n=192).
        # Claims of deltas below ~2 SE are protocol noise (ROADMAP #20).
        out[f"nna_{m}_se"] = float(np.sqrt(max(p * (1.0 - p), 1e-12) / n))
    return out
