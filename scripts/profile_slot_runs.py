#!/usr/bin/env python3
"""Decompose the high-patch-count kernel efficiency gap on hardware.

The 256-patch stress config runs at ~72% of the 64-patch headline
throughput (BENCH_r03 `stress_256_patches` vs the headline config) with
short same-slot runs (mean ~5.6 tile pairs per output slot vs ~40 at 64
patches). This script isolates WHERE that cost lives by timing the raw
kernel launch (`pallas_partial_counts`) on the SAME tile data under
controlled index lists:

- ``real``      — the actual 256-patch pair list (short slot runs).
- ``oneslot``   — identical tile pairs, every output slot relabeled to
                  0 (maximal revisit accumulation, minimal writeback).
                  Timing-only: the counts are wrong but the work is the
                  same per grid step except output handling.
- ``rowsorted`` — identical tile pairs re-sorted by (row tile, slot)
                  (longer same-row input runs, same slot set). NOTE:
                  re-sorting breaks the slot-contiguity the revisit
                  accumulation needs — also timing-only.

If ``oneslot`` matches ``real``, output-block transitions cost nothing
and the residual gap is host/link overhead, not the kernel. Run on the
real chip (the interpreter path has no pipeline to measure).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

from yet_another_wizz_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def timed_median(fn, runs: int = 5):
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), min(times), max(times)


def main() -> None:
    import jax

    from yet_another_wizz_tpu import Catalog, Configuration
    from yet_another_wizz_tpu.correlation import measurements as M
    from yet_another_wizz_tpu.examples import generate_mock_data
    from yet_another_wizz_tpu.ops.pallas_paircount import (
        MAX_PAIRS_PER_CALL,
        _grid_size,
        pallas_partial_counts,
    )
    from yet_another_wizz_tpu.ops.tiles import bucket_size

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    small = "--small" in sys.argv  # CPU smoke test (interpret mode)
    scale = 100 if small else 1
    mock = generate_mock_data(
        num_reference=200_000 // scale,
        num_unknown=500_000 // scale,
        num_randoms=1_000_000 // scale,
        seed=12345,
    )
    config = Configuration.create(
        rmin=100, rmax=1000, unit="kpc", zmin=0.15, zmax=1.0, num_bins=11
    )

    captured: list = []
    orig = M.build_tile_pairs

    def spy(tiles1, tiles2, linkage, **kw):
        pairs = orig(tiles1, tiles2, linkage, **kw)
        captured.append((tiles1, tiles2, pairs))
        raise RuntimeError("captured")

    M.build_tile_pairs = spy
    try:
        for npatch in (8, 24) if small else (64, 256):
            captured.clear()
            reference = Catalog.from_arrays(
                **mock["reference"], degrees=False, patch_num=npatch
            )
            centers = reference.get_centers()
            unknown = Catalog.from_arrays(
                **mock["unknown"], degrees=False, patch_centers=centers
            )
            randoms = Catalog.from_arrays(
                **mock["randoms"], degrees=False, patch_centers=centers
            )
            try:
                M.crosscorrelate(
                    config, reference, unknown, ref_rand=randoms,
                    backend="pallas",
                )
            except RuntimeError as err:  # the spy's abort
                if "captured" not in str(err):
                    raise
            tiles1, tiles2, pairs = captured[0]
            # the chord2 table for the DD count (unknown side unbinned)
            links = M.PatchLinkage.from_catalogs(
                config, reference, unknown, randoms
            )
            table = np.asarray(links.edges.chord2_table)

            lane1 = tiles1.device_data()
            lane2 = tiles2.device_data()
            chord2_table = jax.device_put(table.astype(np.float32))

            num_slots = pairs.num_slots
            num_slots_out = bucket_size(num_slots + 1, base=64)
            segment = _grid_size(pairs.num_pairs, MAX_PAIRS_PER_CALL)
            padded = -(-pairs.num_pairs // segment) * segment

            def padded_idx(tile1, tile2, slot):
                t1 = np.zeros(padded, dtype=np.int32)
                t2 = np.zeros(padded, dtype=np.int32)
                sl = np.full(padded, num_slots, dtype=np.int32)
                t1[: pairs.num_pairs] = tile1
                t2[: pairs.num_pairs] = tile2
                sl[: pairs.num_pairs] = slot
                return (
                    jax.device_put(t1),
                    jax.device_put(t2),
                    jax.device_put(sl),
                )

            variants = {
                "real": padded_idx(pairs.tile1, pairs.tile2, pairs.slot),
                "oneslot": padded_idx(
                    pairs.tile1, pairs.tile2, np.zeros_like(pairs.slot)
                ),
            }
            order = np.lexsort((pairs.slot, pairs.tile1))
            variants["rowsorted"] = padded_idx(
                pairs.tile1[order], pairs.tile2[order], pairs.slot[order]
            )

            runs = np.diff(
                np.flatnonzero(
                    np.concatenate([[True], np.diff(pairs.slot) != 0, [True]])
                )
            )
            log(
                f"npatch={npatch}: pairs={pairs.num_pairs} "
                f"slots={num_slots} segment={segment} "
                f"mean_slot_run={runs.mean():.2f}"
            )

            for name, (t1, t2, sl) in variants.items():
                def run(t1=t1, t2=t2, sl=sl):
                    out = pallas_partial_counts(
                        lane1, lane2, t1, t2, sl, chord2_table,
                        num_slots_out=num_slots_out,
                        cols_binned=False,
                        interpret=jax.default_backend() != "tpu",
                        segment=segment,
                        mask_always=True,
                    )
                    # fetch (don't just block): under the tunneled TPU
                    # plugin block_until_ready returns before the remote
                    # execution finishes, so only a data dependency times
                    # the kernel. The fetch cost is identical across
                    # variants and cancels in their differences.
                    jax.device_get(out)

                run()  # warm-up / compile
                med, lo, hi = timed_median(run)
                per_pair = med / (padded * lane1.shape[2] ** 2)
                log(
                    f"  {name:10s}: {med * 1e3:7.2f} ms "
                    f"[{lo * 1e3:.2f}, {hi * 1e3:.2f}]  "
                    f"({per_pair * 1e15:.0f} fs/candidate pair)"
                )
    finally:
        M.build_tile_pairs = orig


if __name__ == "__main__":
    main()
