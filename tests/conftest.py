"""Test configuration: run JAX on CPU with a virtual 8-device mesh so that
multi-chip sharding logic is exercised without TPU hardware (the strategy from
SURVEY.md §4: jax.distributed-style simulation via
--xla_force_host_platform_device_count)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
