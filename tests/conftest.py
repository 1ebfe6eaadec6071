"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on a virtual CPU mesh
(xla_force_host_platform_device_count), per the build brief. Must be set
before jax initializes a backend, hence conftest import time.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
