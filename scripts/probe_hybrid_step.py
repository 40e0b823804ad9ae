#!/usr/bin/env python
"""Time ONLY the hybrid 20k train step (clean-exit TPU session)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from steplib import claim_device, headline_cfg, time_train_step

claim_device()
ms = time_train_step(headline_cfg("hybrid"), iters=20, warmup=5,
                     tag="hybrid 20k RGB")
print(f"[probe] {ms * 293 / 1000:.1f} s/epoch (293 steps)", flush=True)
