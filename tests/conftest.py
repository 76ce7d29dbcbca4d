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
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(0)
