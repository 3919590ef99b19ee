"""Profiling and compilation-cache utilities.

Spec: reference auxiliary surface (SURVEY.md §5) — the reference has only
Numba disk caches (``cache=True`` + a CLI ``clean``); the TPU equivalents
are ``jax.profiler`` traces and the XLA persistent compilation cache.
"""

from __future__ import annotations

import contextlib
import os
import time


def jnp_zero():
    import jax.numpy as jnp

    return jnp.zeros(())


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Persistent XLA compile cache (amortizes the ~20-40 s first compile).

    An explicit ``JAX_COMPILATION_CACHE_DIR`` env var wins over the
    default location so callers (e.g. the test conftest) can isolate
    runs: a process killed mid-write leaves a truncated cache entry, and
    jax SEGFAULTS deserializing it — sharing one cache dir across
    concurrently-killed processes is how that happens."""
    import jax

    if os.environ.get("PHOSKINTIME_DISABLE_COMPILE_CACHE"):
        return ""  # test suite: serialized CPU executables have crashed
    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/phoskintime_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    return cache_dir


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/phoskintime_trace"):
    """``with trace(): ...`` captures a jax.profiler trace for xprof/TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, logger=None):
    """Wall-clock timer that blocks on device completion."""
    import jax

    t0 = time.perf_counter()
    yield
    try:
        # effects_barrier only waits for EFFECTFUL computations; pure
        # async-dispatched jits are awaited by queueing a trivial op on
        # the default device (in-order execution) and blocking on it
        jax.effects_barrier()
        jax.block_until_ready(jnp_zero())
    except Exception:
        pass
    dt = time.perf_counter() - t0
    msg = f"[timing] {label}: {dt:.3f}s"
    (logger.info if logger else print)(msg)
