"""Test configuration: force the CPU backend with 8 virtual devices so
sharding/halo-exchange logic is exercised without a TPU pod
(SURVEY.md section 4).

Note: this environment pre-imports jax via a sitecustomize on PYTHONPATH
(JAX_PLATFORMS=axon), so setting env vars here is too late -- we must go
through jax.config.update before any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
