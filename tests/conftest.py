"""Test configuration: force a virtual 8-device CPU mesh before any jax use.

The environment boots with the axon TPU backend pinned (JAX_PLATFORMS=axon via
sitecustomize), so plain env-var overrides are too late; jax.config.update
works as long as no computation ran yet. Multi-chip sharding logic is
validated on 8 virtual CPU devices, mirroring how the driver dry-run-compiles
the multi-chip path.
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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
