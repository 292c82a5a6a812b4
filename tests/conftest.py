"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(packet data-parallel, slab FFT) execute in CI without TPU hardware.

NOTE: in this image a sitecustomize pre-imports jax with the TPU (axon)
backend selected via JAX_PLATFORMS, so plain env-var overrides are too
late — we must go through jax.config before any backend initialises.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
