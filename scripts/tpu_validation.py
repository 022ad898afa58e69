#!/usr/bin/env python3
"""Hardware validation: drive the full measurement on the TPU and gate it
against the float64 kd-tree oracle (run manually / by the verify skill;
the pytest suite runs on CPU).

Usage: python scripts/tpu_validation.py [--small]
"""

import os
import sys
import time

# keep the persistent compile cache next to the repo: /tmp may be
# purged between runs, and a cold remote compile costs many minutes
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from yet_another_wizz_tpu.utils.compile_cache import (
    enable_persistent_compile_cache,
)

# the env vars above are not enough under the TPU plugin in use here:
# the cache stays uninitialized unless set through the config API
enable_persistent_compile_cache()


def main() -> int:
    import jax

    from yet_another_wizz_tpu import Catalog, Configuration
    from yet_another_wizz_tpu.correlation.measurements import (
        autocorrelate,
        crosscorrelate,
    )
    from yet_another_wizz_tpu.examples import generate_mock_data
    from yet_another_wizz_tpu.redshifts import RedshiftData

    small = "--small" in sys.argv
    scale = 0.2 if small else 1.0
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    mock = generate_mock_data(
        num_reference=int(50_000 * scale),
        num_unknown=int(120_000 * scale),
        num_randoms=int(240_000 * scale),
        seed=5,
    )
    reference = Catalog.from_arrays(
        **mock["reference"], degrees=False, patch_num=32
    )
    centers = reference.get_centers()
    unknown = Catalog.from_arrays(
        **mock["unknown"], degrees=False, patch_centers=centers
    )
    randoms = Catalog.from_arrays(
        **mock["randoms"], degrees=False, patch_centers=centers
    )
    config = Configuration.create(
        rmin=100, rmax=1000, unit="kpc", zmin=0.15, zmax=1.0, num_bins=8
    )

    def run(backend):
        (w_sp,) = crosscorrelate(
            config, reference, unknown, ref_rand=randoms, backend=backend
        )
        (w_ss,) = autocorrelate(config, reference, randoms, backend=backend)
        return RedshiftData.from_corrfuncs(w_sp, w_ss)

    t0 = time.perf_counter()
    nz_device = run("auto")
    print(f"device measurement (cold): {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    nz_device = run("auto")
    print(f"device measurement (warm): {time.perf_counter() - t0:.2f}s")

    # the blocked out-of-core path must reproduce the in-memory device
    # result (same kernel, different streaming) — gate it on hardware too
    t0 = time.perf_counter()
    (w_sp_blocked,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="auto",
        max_resident_patches=8,
    )
    (w_ss_blocked,) = autocorrelate(
        config, reference, randoms, backend="auto", max_resident_patches=8
    )
    nz_blocked = RedshiftData.from_corrfuncs(w_sp_blocked, w_ss_blocked)
    print(f"blocked measurement (warm): {time.perf_counter() - t0:.2f}s")
    blocked_rel = np.nanmax(np.abs(nz_blocked.data / nz_device.data - 1.0))
    print(f"blocked vs in-memory max rel deviation: {blocked_rel:.2e}")

    print("computing float64 oracle (single-core, takes a while)...")
    nz_oracle = run("oracle")

    rel = np.abs(nz_device.data / nz_oracle.data - 1.0)
    print(f"n(z) device: {np.round(nz_device.data, 4)}")
    print(f"n(z) oracle: {np.round(nz_oracle.data, 4)}")
    print(f"max rel deviation: {np.nanmax(rel):.2e}")

    ok = np.nanmax(rel) < 1e-4 and blocked_rel < 1e-5
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
