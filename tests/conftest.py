"""Test configuration: force a CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) since real multi-chip TPU
hardware is not available in CI.

Note: the environment preloads jax and sets ``JAX_PLATFORMS=axon`` (a
tunneled TPU backend) via sitecustomize, so we must *override* (not
setdefault) and also update the already-imported jax config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
