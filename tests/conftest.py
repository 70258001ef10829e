"""Test config: run on an 8-virtual-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 implication).

Note: in this environment the axon TPU plugin ignores the JAX_PLATFORMS
env var, so we must force the platform through jax.config before any
backend initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
