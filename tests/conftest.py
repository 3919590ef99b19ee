"""Test configuration: run on CPU with 8 virtual devices and float64.

The 8-device CPU mesh is the "fake backend" for multi-chip sharding tests
(no real multi-chip TPU is available in CI); x64 gives reference parity.

Note: the execution environment preloads jax with JAX_PLATFORMS=axon (the
TPU tunnel), so we must override via jax.config *before* the first backend
initialization rather than via environment variables.
"""

import os
import tempfile

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# no persistent XLA compile cache inside the suite: CLI paths enable it
# process-wide mid-run, and two full-suite runs segfaulted inside
# compile/cache paths late in the run (jax 0.9.0 CPU); standalone module
# runs without the cache have never crashed
os.environ["PHOSKINTIME_DISABLE_COMPILE_CACHE"] = "1"
os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="phoskin_xla_cache_")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiler_state():
    """Drop compiled executables between test modules.

    Hundreds of live jitted programs accumulate over the full suite; the
    two observed late-suite segfaults were inside XLA compile/cache
    paths, and bounding resident compiler state is the effective
    mitigation (standalone module runs never crash). Costs recompiles of
    the few cross-module shared programs."""
    yield
    jax.clear_caches()
