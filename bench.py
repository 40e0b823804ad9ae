#!/usr/bin/env python
"""Benchmark: the reference's headline workload on one TPU chip.

Reference baseline (BASELINE.md): ~25 s/epoch for 20k-point RGB training,
batch 8, latent_dim 128, `mlp` point-flow backbone, on 1x H100
(README.md:153).  The Scissors-class dataset is 47 models x 50 poses =
2350 clouds -> 293 steps/epoch at batch 8 (drop_last), so

    sec/epoch = measured_step_time * 293.

This script times the full jitted train step (fwd + bwd + AdamW + EMA) and
the serve-path samplers for BOTH backbones with on-device data, computes
MFU from the analytic model-FLOP count (pcfm/utils/flops.py: dot/conv
FLOPs of the traced step vs the 197 TFLOP/s v5e bf16 peak), prints ONE
JSON line on stdout carrying every judged metric, and extra detail on
stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from pcfm.config import Config
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step
from pcfm.utils.flops import V5E_BF16_PEAK, count_matmul_flops

STEPS_PER_EPOCH = 293          # 47 Scissors models x 50 poses / batch 8
BASELINE_SEC_PER_EPOCH = 25.0  # reference README.md:153 (1x H100)


def bench_step(cfg: Config, b: int, n: int, iters: int = 50,
               warmup: int = 5):
    """Returns (sec/step, model FLOPs/step, hbm_bytes_or_None)."""
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0),
                                   total_steps=cfg.epochs * STEPS_PER_EPOCH)
    step = make_train_step(bundle, tx, donate=True)
    key = jax.random.PRNGKey(1)
    batch = {"pts": jax.random.normal(key, (b, n, 3), jnp.float32),
             "rgb": jax.random.uniform(key, (b, n, 3), jnp.float32)}
    if cfg.cond_dim:
        batch["cond"] = jax.random.normal(key, (b, cfg.cond_dim),
                                          jnp.float32)
    batch = jax.device_put(batch)
    c_on, d_p = jnp.float32(1.0), jnp.float32(0.1)

    flops = count_matmul_flops(step, state, batch, key, c_on, d_p)
    hbm = None
    try:  # step-footprint from the compiled buffer assignment (the
        # reference parity row: ~9 GB on H100, README.md:153).  args
        # covers params/opt-state/batch; temp is XLA's scratch high-water.
        ma = step.lower(state, batch, key, c_on,
                        d_p).compile().memory_analysis()
        if ma is not None:
            peak = getattr(ma, "peak_memory_in_bytes", 0) or 0
            hbm = max(peak, ma.argument_size_in_bytes
                      + ma.temp_size_in_bytes)
    except Exception:
        pass

    rngs = [jax.random.fold_in(key, i) for i in range(warmup + iters)]
    for i in range(warmup):
        state, m = step(state, batch, rngs[i], c_on, d_p)
    # NOTE: block_until_ready is unreliable over the axon tunnel (returns
    # before execution completes); a host readback of the loss forces the
    # whole dependent chain of steps.
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, rngs[warmup + i], c_on, d_p)
    float(m["loss"])
    return (time.perf_counter() - t0) / iters, flops, hbm


def bench_sampler(cfg: Config, b: int, n: int, iters: int = 5) -> float:
    """Generation sec/shape at the configured sampler/NFE (the reference
    serve path is Heun, 2*steps net evals per flow — train.py:332-341,
    384-415; BASELINE.md 'sampler sec/shape at fixed NFE')."""
    from pcfm.train.evaluate import make_sample_fn
    bundle, state, _ = init_state(cfg, jax.random.PRNGKey(0), 100)
    sample_fn = make_sample_fn(bundle)
    key = jax.random.PRNGKey(1)
    x = sample_fn(state, None, key, b, n)
    float(jnp.sum(x))
    t0 = time.perf_counter()
    for i in range(iters):
        x = sample_fn(state, None, jax.random.fold_in(key, i), b, n)
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / iters / b


def main():
    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    b, n = 8, 20000
    out = {}
    base = dict(latent_dim=128, has_rgb=True, cond_dim=1,
                pointflow_rgb=True, use_rgb_in_latent=True, amp=True,
                use_bf16=True, tr_max_sample_points=n, batch_size=b,
                warmup_steps=0)
    cfg = Config(pf_backbone="mlp", **base)

    step_time, fl, hbm = bench_step(cfg, b, n)
    sec_per_epoch = step_time * STEPS_PER_EPOCH
    out["mlp_step_ms"] = round(step_time * 1e3, 2)
    out["mlp_sec_per_epoch"] = round(sec_per_epoch, 3)
    out["mlp_mfu"] = round(fl / step_time / V5E_BF16_PEAK, 4)
    if hbm:
        out["mlp_step_hbm_gb"] = round(hbm / 2**30, 2)
    print(f"[bench] mlp 20k RGB: {step_time*1e3:.2f} ms/step, "
          f"{b*n/step_time/1e6:.2f}M pts/s, {sec_per_epoch:.2f} s/epoch "
          f"(293 steps), {fl/1e12:.2f} TFLOP/step, "
          f"MFU {out['mlp_mfu']*100:.1f}%"
          + (f", step HBM {hbm / 2**30:.2f} GiB" if hbm else ""),
          file=sys.stderr)

    try:  # opt-in turbo trunk (--pf_film_every 2): same Dense stack,
        # FiLM every 2nd block; quality-validated at demo + full-20k
        # scale (ROADMAP #19, docs/filmevery_ab.json)
        t_time, t_fl, _ = bench_step(cfg.replace(pf_film_every=2), b, n,
                                     iters=30)
        out["mlp_turbo_step_ms"] = round(t_time * 1e3, 2)
        out["mlp_turbo_mfu"] = round(t_fl / t_time / V5E_BF16_PEAK, 4)
        print(f"[bench] mlp turbo (--pf_film_every 2): "
              f"{t_time*1e3:.2f} ms/step "
              f"({t_time*STEPS_PER_EPOCH:.2f} s/epoch), "
              f"MFU {out['mlp_turbo_mfu']*100:.1f}%", file=sys.stderr)
    except Exception as e:
        print(f"[bench] mlp turbo bench failed: {e}", file=sys.stderr)

    try:
        hcfg = Config(pf_backbone="hybrid", **base)
        h_time, h_fl, h_hbm = bench_step(hcfg, b, n, iters=20)
        out["hybrid_step_ms"] = round(h_time * 1e3, 2)
        out["hybrid_sec_per_epoch"] = round(h_time * STEPS_PER_EPOCH, 3)
        out["hybrid_mfu"] = round(h_fl / h_time / V5E_BF16_PEAK, 4)
        if h_hbm:
            out["hybrid_step_hbm_gb"] = round(h_hbm / 2**30, 2)
        print(f"[bench] hybrid 20k RGB: {h_time*1e3:.1f} ms/step "
              f"({h_time*STEPS_PER_EPOCH:.1f} s/epoch), "
              f"{h_fl/1e12:.2f} TFLOP/step, "
              f"MFU {out['hybrid_mfu']*100:.1f}%"
              + (f", step HBM {h_hbm / 2**30:.2f} GiB" if h_hbm else ""),
              file=sys.stderr)
    except Exception as e:
        print(f"[bench] hybrid bench failed: {e}", file=sys.stderr)

    for name, bb in (("mlp", cfg), ("hybrid", None)):
        try:
            bb = bb if bb is not None else Config(pf_backbone="hybrid",
                                                  **base)
            samp = bench_sampler(bb.replace(sample_steps=50,
                                            sampler="heun"), b, n)
            out[f"sampler_{name}_heun50_ms_per_shape"] = round(samp * 1e3, 2)
            print(f"[bench] {name} sampler (Heun x50, 100 NFE/flow): "
                  f"{samp*1e3:.1f} ms/shape @ 20k pts", file=sys.stderr)
            fast = bench_sampler(bb.replace(sample_steps=6,
                                            sampler="euler"), b, n)
            out[f"sampler_{name}_euler6_ms_per_shape"] = round(fast * 1e3, 2)
            print(f"[bench] {name} sampler (euler x6 — the pcfm.distill "
                  f"student NFE): {fast*1e3:.1f} ms/shape @ 20k pts",
                  file=sys.stderr)
        except Exception as e:  # secondary metric; never fail the bench
            print(f"[bench] {name} sampler bench failed: {e}",
                  file=sys.stderr)

    print(json.dumps({
        "metric": "train_sec_per_epoch_20k_rgb_mlp",
        "value": round(sec_per_epoch, 3),
        "unit": "s/epoch (293 steps, batch 8, 20k pts, 1 chip)",
        "vs_baseline": round(BASELINE_SEC_PER_EPOCH / sec_per_epoch, 2),
        **out,
    }))


if __name__ == "__main__":
    main()
