"""Test config: force an 8-device virtual CPU mesh before any JAX computation.

Note: the axon TPU plugin's sitecustomize calls ``axon.register`` at interpreter
start, which force-sets ``jax_platforms="axon,cpu"`` — a plain JAX_PLATFORMS env
var is NOT enough; we must update jax.config after import.

Multi-chip sharding (pjit/shard_map) is validated on virtual CPU devices exactly
as the driver's dryrun does; real-TPU benches live in bench.py, not the test suite.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# compile-once-per-machine: the suite is dominated by XLA compiles, so cache them
# The persistent compilation cache is DISABLED by default: on this machine the
# XLA:CPU executable (de)serialization path crashed the suite repeatedly
# (SIGSEGV in get_executable_and_time, SIGABRT in put_executable_and_time,
# machine-feature-mismatch SIGILL warnings) — even with
# jax_persistent_cache_enable_xla_caches="none" and a freshly purged cache.
# Opt back in with JAX_TEST_CACHE_DIR=/path if the host is known-good.
_cache_dir = os.environ.get("JAX_TEST_CACHE_DIR", "")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # persist every executable (see eval_clone.py on the sub-second floor)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
