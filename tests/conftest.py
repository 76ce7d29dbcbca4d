"""Test env: force CPU with 8 fake devices.

This is the standard JAX substitute for a multi-chip cluster: mesh/sharding
tests run against 8 XLA host-platform devices (SURVEY.md §4).

Note: this image's axon sitecustomize force-sets ``jax_platforms=axon,cpu``
at interpreter start, so the env var alone is not enough — we must override
the config AFTER importing jax, before any backend is touched.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in _flags:
    # correctness-only test backend: skipping XLA's optimization passes
    # cuts CPU compile time ~25-30% and the suite is compile-dominated
    # (a compiled step re-runs in ~10 ms; compiles cost seconds each)
    _flags = _flags + " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: identical HLO recurs across tests (param
# init, render/step programs at shared fixture shapes) and across local
# re-runs; each hit saves a multi-second single-core CPU compile
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/nerf_simple_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(0)
