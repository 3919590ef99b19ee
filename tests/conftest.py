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

# isolated per-run XLA compile cache: CLI paths enable the persistent
# cache mid-suite, and a SHARED dir is a segfault hazard (a process
# killed mid-write leaves a truncated entry that jax crashes reading)
os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="phoskin_xla_cache_")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
