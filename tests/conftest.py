"""Test environment: force an 8-virtual-device CPU platform before JAX loads,
so sharding tests run without TPU hardware and unit tests are hermetic."""

import os

# Force CPU even when the session environment pins JAX_PLATFORMS=axon (TPU):
# unit tests must be hermetic and the sharding tests need 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have imported jax (baking in JAX_PLATFORMS=axon) before
# this conftest ran; the config update still wins if no backend is live yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
