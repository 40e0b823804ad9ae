#!/usr/bin/env python
"""Oracle 1-NNA floor for the genq suite protocol (round-4 instrument
calibration): how close to the 0.5 ideal can a PERFECT conditional
generator get on the 192-cloud synthetic protocol?

The suite is conditioned — each generated cloud shares its reference
cloud's theta (scripts/gen_quality_tpu.py run_suite).  The oracle
analogue is a fresh matched-theta draw from the data generator itself
(pcfm/data/synthetic.py hinge_shape + the dataset's center/scale
normalization): real-vs-real on the exact protocol.  The resulting
1-NNA-CD band is the achievable floor — model runs should be judged
against it, not against the asymptotic 0.5 (finite sets of an
articulated family have real same-set structure).

Runs on the TPU by default (the pairwise CD/EMD matrices are pure
chamfer/approxmatch compute — fast on-chip, and this dev box has ONE
host core so CPU evaluation both crawls and starves a concurrent TPU
job's host thread; measured r4).  Launch it like any other TPU session:
alone, clean-exiting (CLAUDE.md axon notes).  ORACLE_CPU=1 forces CPU
(forced BEFORE any device op — the axon plugin ignores the
JAX_PLATFORMS env var).  Writes docs/genq/oracle_floor.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("ORACLE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from pcfm.data.synthetic import SyntheticDataset, hinge_shape
from pcfm.eval.metrics import generative_metrics

TEST = int(os.environ.get("TEST", 192))
N = int(os.environ.get("NPTS", 2048))
SEEDS = [int(s) for s in os.environ.get("SEEDS", "11,22,33").split(",")]
# cd+emd on TPU (the r4 final-band protocol); cd-only is the sane CPU set
METRICS = tuple(m for m in os.environ.get(
    "METRICS", "cd" if os.environ.get("ORACLE_CPU") else "cd,emd"
).split(",") if m.strip())
OUT = os.environ.get(
    "OUT", os.path.join(os.path.dirname(__file__), "..",
                        "docs", "genq", "oracle_floor.json"))


def matched_theta_draw(thetas: np.ndarray, seed: int) -> np.ndarray:
    """Fresh clouds at the protocol's thetas, normalized exactly as
    SyntheticDataset.__init__ does (per-cloud center + max-abs scale)."""
    rng = np.random.RandomState(seed)
    clouds = []
    for th in thetas:
        xyz, _ = hinge_shape(rng, N, float(th))
        c = xyz.mean(0)
        s = float(np.abs(xyz - c).max()) or 1.0
        clouds.append(((xyz - c) / s).astype(np.float32))
    return np.stack(clouds)


def main():
    ds_te = SyntheticDataset(split="test", size=TEST, n_points=N,
                             tr_sample_size=N, te_sample_size=N,
                             with_rgb=True, with_cond=True, seed=0)
    te_pts = np.stack(ds_te.clouds)
    print(f"[oracle] device: {jax.devices()[0]}, metrics {METRICS}",
          flush=True)
    rows = []
    for s in SEEDS:
        t0 = time.time()
        oracle = matched_theta_draw(ds_te.thetas, 1000 + s)
        suite = {k: float(v) for k, v in
                 generative_metrics(oracle, te_pts,
                                    metrics=METRICS).items()}
        rows.append({"seed": s, **suite})
        print(f"[oracle] seed {s} ({time.time() - t0:.0f}s): "
              f"{ {k: round(v, 4) for k, v in suite.items()} }", flush=True)
    agg = {}
    for k in rows[0]:
        if k == "seed":
            continue
        vals = [r[k] for r in rows]
        agg[k] = {"mean": round(float(np.mean(vals)), 4),
                  "min": round(float(np.min(vals)), 4),
                  "max": round(float(np.max(vals)), 4)}
    result = {"protocol": {"test_clouds": TEST, "n_points": N,
                           "seeds": SEEDS, "metrics": list(METRICS),
                           "note": "matched-theta real-vs-real draws; "
                                   "achievable 1-NNA floor for the "
                                   "conditioned suite"},
              "agg": agg, "per_seed": rows}
    print(f"[oracle] agg: {agg}", flush=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[oracle] wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
