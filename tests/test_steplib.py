"""Pin the shared TPU-probe harness (scripts/steplib.py) at toy scale.

Every step-time number in BENCH/ROADMAP flows through
``steplib.time_train_step``; this smoke test keeps its contract honest on
CPU: headline_cfg builds the reference-README workload config (BASELINE.md
shape), the timing loop compiles + runs the real jitted train step, and
the returned value is a finite positive ms/step.
"""
import importlib.util
import os

import jax

_SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                       "steplib.py")


def _load_steplib():
    spec = importlib.util.spec_from_file_location("steplib", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_headline_cfg_shape():
    sl = _load_steplib()
    cfg = sl.headline_cfg("mlp")
    # the BASELINE.md workload: 20k RGB points, batch 8, bf16 AMP, 1 cond
    assert cfg.tr_max_sample_points == 20000 and cfg.batch_size == 8
    assert cfg.has_rgb and cfg.pointflow_rgb and cfg.use_rgb_in_latent
    assert cfg.amp and cfg.use_bf16 and cfg.cond_dim == 1
    # kwargs override the workload knobs (probes rely on this)
    assert sl.headline_cfg("mlp", n=64, b=2,
                           pf_width=32).pf_width == 32


def test_time_train_step_toy():
    sl = _load_steplib()
    cfg = sl.headline_cfg("mlp", n=64, b=2, pf_width=32, pf_depth=2,
                          latent_dim=8, ctx_dim=16)
    ms = sl.time_train_step(cfg, iters=2, warmup=1)
    assert ms > 0.0 and ms == ms  # finite positive


def test_claim_device_returns_first_device():
    sl = _load_steplib()
    assert sl.claim_device() == jax.devices()[0]
