"""Test configuration: force the CPU backend with 8 virtual devices.

The reference runs its CPU OpenCL backend as the test double for a GPU
(tests/dwarf_tests/utils.cpp:8-17); our equivalent is JAX's CPU platform,
with ``xla_force_host_platform_device_count=8`` faking an 8-chip mesh so the
distributed (shard_map) paths are exercised without TPU hardware.

Note: env vars alone are not enough — a sitecustomize hook may import jax at
interpreter startup (before conftest), so JAX_PLATFORMS from the environment
is already consumed. Backends are initialized lazily though, so
``jax.config.update`` at conftest import time still wins as long as no test
ran a computation yet.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend"
)
assert len(jax.devices()) >= 8, (
    "xla_force_host_platform_device_count failed — was a CPU backend "
    "already initialized before conftest import?"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
