"""Test configuration: run on a virtual 8-device CPU backend.

Multi-chip sharding logic is validated on a host-platform device mesh
(SURVEY §4: the fake-backend trick); the real TPU is exercised by bench.py
and the driver's compile checks, not by unit tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
