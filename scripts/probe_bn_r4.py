#!/usr/bin/env python
"""r4 probe (VERDICT #4 / ROADMAP #18): attack the hybrid ~95 ms floor at
the BN grid reductions.  Times the 20k hybrid train step with the three
voxel-grid BatchNorm implementations:

  * flax      — stock nn.BatchNorm(axis=-1) on the 5-D NDHWC grid (the
                r3 baseline; trace shows ~7 ms of channel-major transpose
                reductions)
  * flat      — FlatBatchNorm: stats computed on the (B*D*H*W, C) 2-D
                collapse (native layout reduce)
  * flat_bf16 — flat + normalize/output in the bf16 island dtype (halves
                the BN-adjacent grid traffic; stats stay fp32)

Also re-times the mlp step as a control (no voxel BN — should not move).
ONE clean-exiting TPU session; order is interleaved A/B/A to control for
drift.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pcfm.nn.pvconv as pvc
from steplib import claim_device, headline_cfg, time_train_step

claim_device()

results = {}
order = ["flax", "flat", "flat_bf16", "flat", "flax"]  # interleaved
for impl in order:
    pvc.BN_IMPL = impl
    ms = time_train_step(headline_cfg("hybrid"), iters=15, warmup=4,
                         tag=f"hybrid 20k RGB bn={impl}")
    results.setdefault(impl, []).append(ms)

pvc.BN_IMPL = "flat"
ms_mlp = time_train_step(headline_cfg("mlp"), iters=15, warmup=4,
                         tag="mlp 20k RGB control")

print("\n[probe_bn_r4] summary (ms/step):", flush=True)
for impl, vals in results.items():
    print(f"  {impl:10s} {min(vals):7.1f} (runs: "
          + ", ".join(f"{v:.1f}" for v in vals) + ")", flush=True)
print(f"  mlp control {ms_mlp:7.1f}", flush=True)
