"""Test configuration: force CPU with a virtual 8-device mesh.

The standard JAX trick for testing multi-device sharding without hardware
(SURVEY.md §4): ``xla_force_host_platform_device_count=8``. The session env
pins ``JAX_PLATFORMS=axon`` (remote TPU tunnel) which is far too slow for a
test suite and cannot be overridden via the environment, so we override via
``jax.config`` before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _derandomize():
    """Reference parity: ``tests/base_test.py::DerandomizedTestCase`` seeds
    NumPy's global RNG; JAX code uses explicit keys per test."""
    np.random.seed(0)
    yield


@pytest.fixture
def key():
    return jax.random.key(0)
