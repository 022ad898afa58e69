"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's deterministic test setup (it pins
``YAW_NUM_THREADS=1``, /root/reference/tests/conftest.py); here we force
the CPU backend with 8 virtual devices so sharding/mesh code paths are
exercised without TPU hardware. Pallas kernels run in interpreter mode on
CPU.

The ambient environment may pre-import jax with a TPU platform pinned
(a sitecustomize registers the hardware plugin at interpreter startup),
so the environment override alone is not sufficient — the jax config is
updated and backends are reset if they were already initialised.
"""

import os

# must be set before jax initialises a backend; hard-override because the
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

import jax  # noqa: E402

from yet_another_wizz_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache,
)

# the env vars above do not reliably initialize the cache (see the
# compile_cache module docstring); the config API does
enable_persistent_compile_cache()

jax.config.update("jax_platforms", "cpu")
if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
    # jax was initialised (e.g. by sitecustomize) before this file ran
    if hasattr(jax, "clear_backends"):  # removed in jax >= 0.5
        jax.clear_backends()
    else:
        import jax.extend.backend

        jax.extend.backend.clear_backends()
assert jax.default_backend() == "cpu", "tests require the CPU backend"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
