#!/usr/bin/env python
"""Probe sorted-kernel WINDOW_FACTOR variants in ONE clean-exit TPU
session (each config recompiles, ~60-90 s over the tunnel).

Measured (r2): wf=2.0 105.2 / wf=1.25 105.7 / wf=1.0 109.3 ms — the
kernels are pass-overhead/DMA-bound, not multi-hot bound; keep 2.0."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from steplib import claim_device, headline_cfg, time_train_step

claim_device()

import pcfm.ops.pallas.voxel_sorted as pvs

BUDGET = float(os.environ.get("PROBE_BUDGET_S", 560))
T0 = time.perf_counter()

for wf in (2.0, 1.25, 1.0):
    if BUDGET - (time.perf_counter() - T0) < 150:
        print("[probe] budget out", flush=True)
        sys.exit(0)
    pvs.WINDOW_FACTOR = wf
    time_train_step(headline_cfg("hybrid"), tag=f"wf={wf}")
