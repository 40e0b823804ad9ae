"""Test configuration: force an 8-device virtual CPU platform BEFORE any
backend initialization, so multi-device sharding tests run anywhere
(SURVEY.md §4).

Note: on this image the axon TPU plugin ignores the JAX_PLATFORMS env var,
so we must force the platform through jax.config — and we still set the env
vars for subprocesses.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
