"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's deterministic test setup (it pins
``YAW_NUM_THREADS=1``, /root/reference/tests/conftest.py); here we force the
CPU backend with 8 virtual devices so sharding/mesh code paths are exercised
without TPU hardware. Pallas kernels run in interpreter mode on CPU.
"""

import os

# must be set before jax is imported anywhere; hard-override because the
# ambient environment pins JAX_PLATFORMS to the TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_yawt")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
