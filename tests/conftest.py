"""Test harness config.

Tests run hermetically on CPU with 8 virtual XLA devices so multi-chip
sharding paths are exercised without TPU hardware (the fake-backend
mechanism the reference lacks — SURVEY.md §4). Must set env before jax
initializes a backend.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# This environment force-registers a TPU platform plugin and overrides
# JAX_PLATFORMS; jax.config.update is the reliable way to pin tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
