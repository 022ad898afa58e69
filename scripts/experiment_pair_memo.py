"""On-chip A/B of the pair-list memo (YAWT_PAIR_MEMO).

Times warm repeats of the bench headline (64-patch) and 256-patch stress
configurations with the memo enabled vs disabled. The memo removes the
per-run native tile-pair filter AND the stacked index-list upload from
warm repeats (the tomographic-production pattern: the same catalogs are
measured many times), so the delta should track the bench record's
``residual_s.pair_build`` plus the upload share of
``kernel_gap_and_dispatch``.

Run on the TPU: ``python scripts/experiment_pair_memo.py``
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_warm(fn, runs=5):
    fn()  # warm-up (compile + memo fill when enabled)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), sorted(round(t, 4) for t in times)


def main():
    from yet_another_wizz_tpu import Catalog, Configuration
    from yet_another_wizz_tpu.correlation.measurements import crosscorrelate
    from yet_another_wizz_tpu.examples import generate_mock_data
    from yet_another_wizz_tpu.redshifts import RedshiftData

    mock = generate_mock_data(
        num_reference=200_000,
        num_unknown=500_000,
        num_randoms=1_000_000,
        seed=12345,
    )
    config = Configuration.create(
        rmin=100, rmax=1000, unit="kpc", zmin=0.15, zmax=1.0, num_bins=11
    )

    results = {}
    for num_patches in (64, 256):
        reference = Catalog.from_arrays(
            **mock["reference"], degrees=False, patch_num=num_patches
        )
        centers = reference.get_centers()
        unknown = Catalog.from_arrays(
            **mock["unknown"], degrees=False, patch_centers=centers
        )
        randoms = Catalog.from_arrays(
            **mock["randoms"], degrees=False, patch_centers=centers
        )

        def run():
            (w_sp,) = crosscorrelate(
                config, reference, unknown, ref_rand=randoms
            )
            return RedshiftData.from_corrfuncs(w_sp)

        for memo in ("1", "0"):
            os.environ["YAWT_PAIR_MEMO"] = memo
            # drop memoised pair lists between arms so the off arm
            # cannot silently reuse an on-arm list object, and the on
            # arm re-fills from scratch
            for cat in (reference, unknown, randoms):
                cat.drop_tile_cache()
            med, runs = timed_warm(run)
            label = f"{num_patches}p memo={memo}"
            results[label] = med
            print(f"{label}: {med:.4f}s warm median {runs}", flush=True)

    for num_patches in (64, 256):
        on = results[f"{num_patches}p memo=1"]
        off = results[f"{num_patches}p memo=0"]
        print(
            f"{num_patches} patches: memo saves {off - on:+.4f}s/run "
            f"({off / on:.3f}x)"
        )


if __name__ == "__main__":
    sys.exit(main())
