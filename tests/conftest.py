"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's deterministic test setup (it pins
``YAW_NUM_THREADS=1``, /root/reference/tests/conftest.py); here we force the
CPU backend with 8 virtual devices so sharding/mesh code paths are exercised
without TPU hardware. Pallas kernels run in interpreter mode on CPU.
"""

import os

# must be set before jax is imported anywhere
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
