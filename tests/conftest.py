"""Test configuration: run on a virtual 8-device CPU backend.

Multi-chip sharding logic is validated on a host-platform device mesh
(SURVEY §4: the fake-backend trick); the real TPU is exercised by bench.py
and the driver's compile checks, not by unit tests.

NOTE: this environment's sitecustomize force-registers the 'axon' TPU
backend regardless of JAX_PLATFORMS, so we must also override via
jax.config after import — otherwise tests silently contend for the single
real TPU chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated test runs skip XLA compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/take_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
