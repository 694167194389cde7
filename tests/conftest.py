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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The suite compiles hundreds of distinct jitted pipeline programs in
    one process; letting them all stay live has produced XLA:CPU
    compile-time SEGFAULTS (exit 139 inside backend_compile_and_load)
    at ~45% of the run — at different tests on different runs, i.e. a
    cumulative-resource cliff, not a bad program. Modules don't share
    compilations (each builds its own configs), so dropping the caches
    at module boundaries costs nothing and bounds per-process
    accumulation."""
    yield
    jax.clear_caches()
