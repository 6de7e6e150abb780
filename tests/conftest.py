"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware by forcing the
CPU platform with 8 virtual devices (the TPU analogue of a fake backend; see
SURVEY.md §4).  In this environment jax is pre-imported by an interpreter
startup hook with JAX_PLATFORMS=axon, so we must override via jax.config
(still before first backend use) rather than env vars alone.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
