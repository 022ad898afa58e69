#!/usr/bin/env python3
"""Split a warm count's wall-clock into queue / device-execute / fetch.

The bench's roofline residuals (``roofline.*.residual_s``) subtract the
measured host costs from the wall and leave a remainder; this experiment
attributes that remainder directly by timing the three stages of the two
counts (DD, RD) of a configuration separately:

1. ``queue``: the deferred ``count_pairs_tiles`` calls — host-side pair
   list packing, the stacked index upload handoff, and the async jit
   dispatch;
2. ``exec``: fetching a 1-element slice of each deferred result — the
   tiny transfer forces the queued device execution to completion while
   moving ~nothing over the link (``block_until_ready`` is unreliable
   under the tunneled plugin: it can return before remote execution
   finishes, see scripts/profile_slot_runs.py);
3. ``fetch``: the full ``device_get`` of the result tensors.

Findings this script produced (v5e via tunnel, late round 4):

- single-scale headline config: exec 0.173 s vs modelled bound 0.155 s
  (1.13x) — the flat per-op model slightly undercounts real execution
  (pipeline effects), everywhere, not just in direct mode;
- multiscale-rweight, arcsine direct block: exec 0.530 s vs bound
  0.403 s (1.35x) — the gap earlier records attributed to "launch
  dispatch + index-list upload" is in fact DEVICE EXECUTION: the
  sqrt/arcsine/log/exp chain dispatches below the flat-op rate;
- multiscale-rweight, small-angle polynomial block (ops/gweight.py,
  ``THETA_POLY_MAX``): exec 0.427 s — 19% faster, matching the removal
  of both sqrts and the arcsine polynomial from the per-pair cost.

Run: ``python scripts/experiment_exec_split.py [--runs 3]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--runs", type=int, default=3)
    args = parser.parse_args()

    import jax

    from yet_another_wizz_tpu import Catalog, Configuration
    from yet_another_wizz_tpu.correlation.measurements import PatchLinkage
    from yet_another_wizz_tpu.examples import generate_mock_data
    from yet_another_wizz_tpu.ops.linkage import build_tile_pairs
    from yet_another_wizz_tpu.ops.paircount import count_pairs_tiles

    mock = generate_mock_data(
        num_reference=200_000, num_unknown=500_000, num_randoms=1_000_000,
        seed=12345,
    )
    reference = Catalog.from_arrays(
        **mock["reference"], degrees=False, patch_num=64
    )
    unknown = Catalog.from_arrays(
        **mock["unknown"], degrees=False,
        patch_centers=reference.get_centers(),
    )
    randoms = Catalog.from_arrays(
        **mock["randoms"], degrees=False,
        patch_centers=reference.get_centers(),
    )

    config_single = Configuration.create(
        rmin=100, rmax=1000, unit="kpc", zmin=0.15, zmax=1.0, num_bins=11,
    )
    config_multi = Configuration.create(
        rmin=[100, 300, 500], rmax=[300, 500, 1000], unit="kpc",
        rweight=-1.0, resolution=32, zmin=0.15, zmax=1.0, num_bins=11,
    )

    for tag, config, spec_override in (
        ("single", config_single, None),
        ("multi-poly", config_multi, None),
        ("multi-arcsine", config_multi, "arcsine"),
    ):
        links = PatchLinkage.from_catalogs(
            config, reference, unknown, randoms
        )
        edges = links.edges
        binning = config.binning.binning
        direct = None
        table = edges.chord2_table
        if edges.direct is not None:
            direct = edges.direct.spec
            if spec_override == "arcsine":
                direct = direct[:3] + (False,)
            table = edges.direct.combined_table()

        sides = []
        for cat1, cat2 in ((reference, unknown), (randoms, unknown)):
            ts1 = cat1.get_tiles(binning)
            ts2 = cat2.get_tiles(None)
            pairs = build_tile_pairs(ts1, ts2, links.linkage, auto=False)
            sides.append((ts1, ts2, pairs))

        def run_counts():
            t0 = time.perf_counter()
            deferred = [
                count_pairs_tiles(
                    ts1, ts2, pairs, table, defer=True, direct=direct,
                )
                for ts1, ts2, pairs in sides
            ]
            t_queue = time.perf_counter() - t0
            t0 = time.perf_counter()
            for d in deferred:
                np.asarray(jax.device_get(d[:1, :1, :1]))
            t_exec = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = [np.asarray(jax.device_get(d)) for d in deferred]
            t_fetch = time.perf_counter() - t0
            del out
            return t_queue, t_exec, t_fetch

        run_counts()  # warm / compile
        rows = np.array([run_counts() for _ in range(args.runs)])
        med = np.median(rows, axis=0)
        print(
            f"{tag}: direct={direct} queue {med[0]:.4f}s "
            f"exec {med[1]:.4f}s fetch {med[2]:.4f}s "
            f"(runs: {np.round(rows, 4).tolist()})",
            flush=True,
        )


if __name__ == "__main__":
    main()
