#!/usr/bin/env python
"""Probe the r3 sorted-kernel variants (ROADMAP #13) in ONE clean-exit
TPU session: TR-fused multi-hot kernels (FUSE_TR) and bf16 gather
outputs (GATHER_OUT_BF16), alone and combined, on the 20k hybrid step.

Each config recompiles the full step (~60-90 s over the tunnel)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from steplib import claim_device, headline_cfg, time_train_step

claim_device()

import pcfm.ops.pallas.voxel_sorted as pvs

BUDGET = float(os.environ.get("PROBE_BUDGET_S", 900))
T0 = time.perf_counter()

results = {}
for fuse, bf16 in ((False, False), (True, False), (False, True),
                   (True, True)):
    if BUDGET - (time.perf_counter() - T0) < 150:
        print("[probe] budget out", flush=True)
        break
    pvs.FUSE_TR = fuse
    pvs.GATHER_OUT_BF16 = bf16
    tag = f"fuse={int(fuse)} bf16out={int(bf16)}"
    results[tag] = time_train_step(headline_cfg("hybrid"), tag=tag)

print("[probe] summary:", results, flush=True)
