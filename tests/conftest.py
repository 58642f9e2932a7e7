"""Test harness: force an 8-device virtual CPU platform BEFORE jax import.

Multi-host / multi-chip logic is validated on this fake mesh
(SURVEY §4); real-TPU benchmarking happens in bench.py, not the tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-selects its platform via
# jax.config, overriding the env var — override it back for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
