"""Test configuration: force JAX onto CPU with a virtual 8-device mesh so that
multi-chip sharding logic is exercised without TPU hardware (the strategy from
SURVEY.md §4: --xla_force_host_platform_device_count simulation).

Note: this environment's sitecustomize pre-registers a TPU ("axon") backend
and pre-imports jax, so the JAX_PLATFORMS env var is already locked in;
jax.config.update is the reliable way to repoint at CPU (backends initialize
lazily, so doing it here — before any test touches a device — works)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
