#!/usr/bin/env python3
"""End-to-end benchmark: mock clustering-redshift measurement on the TPU
versus the multiprocess CPU reference implementation.

Workload (BASELINE.md): w_sp cross-correlation pair counts (DD + RD) on a
deterministic mock survey with 64 kmeans patches, plus the jackknife n(z)
covariance. The CPU baseline runs the identical measurement through float64
scipy kd-trees in a process pool — the same native kernel and parallelism
strategy as the reference package (which cannot run here directly: it
requires astropy, absent from this image).

Prints exactly one JSON line to stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

# keep the persistent compile cache next to the repo: /tmp may be
# purged between runs, and a cold remote compile costs many minutes
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

# the env vars above are not enough under the TPU plugin in use here:
# the cache stays uninitialized unless set through the config API
from yet_another_wizz_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sanitize_record(obj):
    """Return a strict-JSON-safe copy of a bench record: numpy scalars
    and arrays become native Python values, and any non-finite float
    (live-computed NaN/Inf would make ``json.dumps`` happily emit
    invalid JSON) becomes ``None``. The round-4 driver artifact came
    back ``parsed: null``; nothing may enter the emitted line that a
    strict parser rejects."""
    if isinstance(obj, dict):
        return {str(key): sanitize_record(value) for key, value in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [sanitize_record(value) for value in obj]
    if isinstance(obj, np.ndarray):
        return sanitize_record(obj.tolist())
    if isinstance(obj, (bool, np.bool_)):
        return bool(obj)
    if isinstance(obj, (int, np.integer)):
        return int(obj)
    if isinstance(obj, (float, np.floating)):
        value = float(obj)
        return value if np.isfinite(value) else None
    if obj is None or isinstance(obj, str):
        return obj
    return str(obj)


def _reject_constant(name: str):
    raise ValueError(f"non-strict JSON constant {name!r} in bench record")


def emit_record(result: dict, full_record_path: str | None = None) -> str:
    """Serialise the bench record parse-proof and return the stdout line.

    Sanitises every value (:func:`sanitize_record`), serialises with
    ``allow_nan=False`` so a missed non-finite float fails HERE instead
    of producing an unparseable artifact, and self-verifies with a
    strict ``json.loads`` round-trip (``parse_constant`` rejects
    NaN/Infinity spellings) before anything is printed. When
    ``full_record_path`` is given the full record is also written there
    so a driver-side parse failure can never again lose the numbers.
    """
    clean = sanitize_record(result)
    line = json.dumps(clean, allow_nan=False, separators=(",", ":"))
    json.loads(line, parse_constant=_reject_constant)  # strict round-trip
    if full_record_path is not None:
        with open(full_record_path, "w") as f:
            json.dump(clean, f, allow_nan=False, indent=1)
            f.write("\n")
    return line


def proof_digest(record: dict) -> dict:
    """Compact digest of a one-shot survey/tomography proof record for
    the stdout line (the FULL records stay in their committed
    ``BENCH_oneshot_*.json`` files and in ``BENCH_record.json``; round 4
    embedded them whole and grew the line to 9.5 KB — the prime suspect
    for the driver's ``parsed: null``)."""
    digest = {}
    for key in (
        "config",
        "total_rows_requested",
        "oracle_max_rel_err",
    ):
        if key in record:
            digest[key] = record[key]
    measure = record.get("measure", {})
    for key in (
        "rows",
        "num_patches",
        "cold_wall_s",
        "warm_wall_s",
        "pairs_per_s",
        "peak_host_rss_gb",
        "nz_finite",
    ):
        if key in measure:
            digest[key] = measure[key]
    resident = measure.get("resident_device_bytes", {})
    if "peak" in resident:
        digest["peak_device_bytes"] = resident["peak"]
    crosscheck = record.get("crosscheck", {})
    if "oracle_max_rel_err" in crosscheck:
        digest["oracle_max_rel_err"] = crosscheck["oracle_max_rel_err"]
    # tomographic proofs record wall/gates at the top level
    for key in ("wall_s", "phases_s", "gates"):
        if key in record and key not in digest:
            value = record[key]
            digest[key] = value if not isinstance(value, dict) else {
                k: v for k, v in value.items()
                if isinstance(v, (int, float, bool, str))
            }
    return digest


WARM_RUNS = 5
"""Warm repetitions for the sub-second configs: the tunneled link swings
enough run-to-run that a median of 3 can still land on an outlier pair;
5 costs ~1.5 s total and tightens the record."""

SURVEY_WARM_RUNS = 5
"""Warm repetitions of the 7M-row blocked config: 5 runs plus stall
detection (see :func:`timed_stall_aware`) make a ~20% regression in the
blocked path distinguishable from the tunnel's multi-hundred-x fetch
stalls (BASELINE.md 'link variance')."""

STALL_FACTOR = 1.35
"""A warm run slower than this multiple of the floor (the SECOND-fastest
run — one lucky run must not flag all ordinary runs as stalls) is
classified as a tunnel stall: the compute and upload work of warm runs
is identical, so genuine regressions move the floor while stalls create
one-sided outliers."""


BLOCKED_TOP_PHASES = (
    "rows", "cols", "pairs", "queue", "drain", "preamble", "teardown"
)
"""Top-level phases of the blocked loop's own clock (sub-phases like
``drain_wait``/``drain_fetch`` nest inside ``drain`` and are excluded
from wall sums)."""


def per_run_phases(totals: dict, num_runs: int) -> dict:
    """Per-run phase means from accumulated phase totals.

    ``totals`` holds summed blocked-loop phase timers plus the
    measurement-level ``corr_wall``/``post`` accumulators; counters
    (``num_block_pairs``, ``candidate_pairs``) are dropped. ``setup`` is
    derived as the measurement wall not covered by the blocked loop's
    own clock (catalog open, linkage, normalisation — on the phase clock
    since round 5)."""
    num_runs = max(num_runs, 1)
    phases = {
        key: round(value / num_runs, 2)
        for key, value in totals.items()
        if key not in ("num_block_pairs", "candidate_pairs")
    }
    phases["setup"] = round(
        max(
            phases.pop("corr_wall", 0.0)
            - sum(phases.get(key, 0.0) for key in BLOCKED_TOP_PHASES),
            0.0,
        ),
        2,
    )
    return phases


LINK_STAGING_PHASES = ("rows", "cols")
"""Phases that absorb upload-STAGING waits on the shared tunnel link
(the prefetch-depth A/B in BASELINE.md showed the pack-phase waits are
staging on the link, not queue-empty bubbles) — their bound seconds
live in ``drain``'s link bound, so they are judged compositely."""


def phase_flags(phases: dict, bounds: dict, flag_bounds: dict | None = None):
    """PASS/FLAG per phase, link-aware.

    A phase is flagged when it exceeds 1.5x its bound AND by more than
    0.5 s absolute (small phases must not flag on timer noise).
    ``flag_bounds`` optionally overrides specific bounds for the flag
    check only (e.g. the post-run link re-probe's slower drain bound) —
    the recorded bounds stay the primary calibration.

    Because the rows/cols phases absorb upload staging whose bound
    seconds live in ``drain``, a flagged staging phase is downgraded to
    ``STAGING`` when (a) the COMPOSITE link-riding wall (rows + cols +
    drain_wait) is within 1.15x its composite bound AND (b) the link is
    genuinely saturated (``drain_wait`` >= 0.85x the drain bound) — the
    wall is then the recorded link, not a blocked-path regression.
    Guard (b) keeps a real rows/cols regression (e.g. a store-read
    slowdown) from hiding inside the drain bound's slack when the link
    is healthy. Returns ``(flags, link_phases_vs_bound)``."""
    effective = dict(bounds)
    effective.update(flag_bounds or {})
    flags = {}
    for key in bounds:
        measured = phases.get(key, 0.0)
        limit = effective[key]
        flags[key] = (
            "FLAG"
            if measured > 1.5 * limit and measured - limit > 0.5
            else "PASS"
        )
    composite = None
    if "drain" in effective:
        measured_link = sum(
            phases.get(key, 0.0) for key in LINK_STAGING_PHASES
        ) + phases.get("drain_wait", 0.0)
        bound_link = effective["drain"] + sum(
            effective.get(key, 0.0) for key in LINK_STAGING_PHASES
        )
        if bound_link > 0:
            composite = round(measured_link / bound_link, 2)
            link_saturated = (
                phases.get("drain_wait", 0.0) >= 0.85 * effective["drain"]
            )
            if composite <= 1.15 and link_saturated:
                for key in LINK_STAGING_PHASES:
                    if flags.get(key) == "FLAG":
                        flags[key] = "STAGING"
    return flags, composite


def timed_median(fn, runs: int = WARM_RUNS):
    """Median + spread of `runs` warm wall-clock timings (the TPU tunnel's
    warm timings swing; a single shot is not load-bearing)."""
    times = []
    result = None
    for _ in range(runs):
        t0 = time.perf_counter()
        result = fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), min(times), max(times), result


def timed_stall_aware(
    fn,
    runs: int = SURVEY_WARM_RUNS,
    max_reruns: int = 3,
    snapshot=None,
):
    """Warm timings with tunnel-stall detection and replacement.

    Runs slower than ``STALL_FACTOR`` x the SECOND-fastest run are marked
    as stalls (the floor is the second-fastest so one anomalously fast
    run cannot flag every normal one); each detected stall triggers one
    replacement run (bounded by
    ``max_reruns``), and the reported median is trimmed to the non-stalled
    runs. ``snapshot`` (a callable returning a dict of monotonically
    accumulating counters, e.g. ``lambda: blocked.PHASE_TOTALS``) captures
    per-run counter deltas and sums them over the NON-STALLED runs only —
    phase attribution then covers exactly the runs the trimmed median
    covers, so one stalled run cannot inflate the per-run phase means.
    Returns ``(trimmed_median, all_times, num_stalled, reruns,
    last_result, kept_metrics)`` where ``kept_metrics`` is the summed
    non-stalled deltas (``None`` without ``snapshot``).
    """
    times: list[float] = []
    deltas: list[dict] = []
    result = None

    def one_run():
        nonlocal result
        before = dict(snapshot()) if snapshot is not None else {}
        t0 = time.perf_counter()
        result = fn()
        times.append(time.perf_counter() - t0)
        if snapshot is not None:
            deltas.append({
                key: value - before.get(key, 0)
                for key, value in dict(snapshot()).items()
            })

    for _ in range(runs):
        one_run()

    def stall_flags(ts):
        floor = sorted(ts)[1] if len(ts) > 1 else ts[0]
        return [t > STALL_FACTOR * floor for t in ts]

    reruns = 0
    # one replacement run per DETECTED stall (flagged times stay in the
    # list, so comparing the flag count against reruns already granted
    # prevents a single stall from burning the whole rerun budget)
    while sum(stall_flags(times)) > reruns and reruns < max_reruns:
        one_run()
        reruns += 1
    flags = stall_flags(times)
    kept = [t for t, is_stall in zip(times, flags) if not is_stall]
    kept_metrics = None
    if snapshot is not None:
        kept_metrics = {}
        for delta, is_stall in zip(deltas, flags):
            if is_stall:
                continue
            for key, value in delta.items():
                kept_metrics[key] = kept_metrics.get(key, 0) + value
    return (
        float(np.median(kept)),
        times,
        int(sum(flags)),
        reruns,
        result,
        kept_metrics,
    )


NUM_REFERENCE = 200_000
NUM_UNKNOWN = 500_000
NUM_RANDOMS = 1_000_000
NUM_PATCHES = 64
NUM_BINS = 11

VPU_RATE = 2.43e12
"""Sustained float32 elementwise op rate of one v5e chip (op/s), the
denominator of the roofline model. Calibrated once from the measured
speed-of-light kernel point (2.37 us per 512^2 tile pair at E=2, B=11,
i.e. 22 modelled ops/pair — derivation in BASELINE.md section
'Roofline model'); NOT fitted per round, so regressions show up as a
dropping fraction."""


def ops_per_candidate_pair(edges) -> float:
    """Modelled VPU ops per candidate pair for a measurement's edge
    tables (see BASELINE.md, 'Roofline model'): 15 for the compensated
    chord distance, 1 for the column weight select, 3 per counting edge
    (compare, select, reduce-add), and in direct separation-weighted
    mode the index/weight block plus 3 per adjustment entry — 12 ops on
    the small-angle polynomial path (log + 5-FMA correction + grid
    index + exp), 18 with the explicit sqrt/arcsine chain for grids
    wider than gweight.THETA_POLY_MAX."""
    base = 16.0
    if edges.direct is not None:
        d = edges.direct
        block = 12.0 if d.spec[3] else 18.0
        return (
            base + 3.0 * d.chord2_table.shape[1]
            + block + 3.0 * (d.num_below + d.num_above)
        )
    return base + 3.0 * edges.num_edges


T_SLOT_SWITCH = 1.6e-6
"""Measured per-output-slot-transition cost of the kernel (seconds): each
transition flushes the VMEM revisit accumulator to its HBM output block,
a pipeline cost the per-pair op model excludes. Calibrated once from
scripts/profile_slot_runs.py on the v5e chip (the 'real' minus 'oneslot'
launch-time difference over the slot-run count: 2.2 us/transition at 64
patches, 1.5 us at 256; mean rounded down); NOT re-fitted per round."""


EXEC_EFFICIENCY = {
    "cumulative": 1.13,
    "direct_poly": 1.19,
    "direct_arcsine": 1.35,
}
"""Measured device-execution time over the flat per-op bound, per
kernel op-class (roofline v3). The round-4 residual
``kernel_gap_and_dispatch`` was attributed DIRECTLY on-chip by
scripts/experiment_exec_split.py (queue / forced-execute / fetch
split): it is device execution — the flat op model undercounts
pipeline effects on the plain compare/select path (1.13x) and the
transcendental dispatch rate of the direct separation-weighted blocks
(sqrt+arcsine chain 1.35x; the small-angle polynomial path 1.19x).
Calibrated once from that experiment's measurements; NOT refit per
round, so genuine kernel regressions still surface as a dropping
``model_fraction``."""


def _exec_class(edges) -> str:
    if edges.direct is None:
        return "cumulative"
    return "direct_poly" if edges.direct.spec[3] else "direct_arcsine"


def roofline(
    edges,
    candidate_pairs: float,
    measured_s: float,
    *,
    work_stats: list | None = None,
    link: dict | None = None,
) -> dict:
    """Roofline bound, calibrated execution model, and achieved
    fractions for one timed configuration.

    ``bound_s`` models three measured cost sources: the per-pair kernel
    ops at the sustained VPU rate, the per-output-slot-transition flush
    (dominant at high patch counts, where slot runs are short), and the
    result-tensor fetch through the host-device link (dominant for large
    patch-pair grids on the tunneled chip). ``fraction`` = bound /
    measured wall-clock. ``model_s``/``model_fraction`` additionally
    scale the per-pair term by the MEASURED op-class execution
    efficiency (:data:`EXEC_EFFICIENCY`, roofline v3) — the calibrated
    expectation for this hardware; host prep, uploads and float64
    post-processing account for the remaining gap to 1.0.
    """
    pair_s = candidate_pairs * ops_per_candidate_pair(edges) / VPU_RATE
    bound = pair_s
    model = pair_s * EXEC_EFFICIENCY[_exec_class(edges)]
    detail = {"exec_class": _exec_class(edges)}
    if work_stats:
        transitions = sum(w["slot_transitions"] for w in work_stats)
        switch_s = transitions * T_SLOT_SWITCH
        bound += switch_s
        model += switch_s
        detail["slot_switch_s"] = round(switch_s, 4)
        if link and link.get("fetch_mb_s"):
            fetch_bytes = sum(w["fetch_bytes"] for w in work_stats)
            fetch_s = fetch_bytes / (link["fetch_mb_s"] * 1e6)
            bound += fetch_s
            model += fetch_s
            detail["fetch_s"] = round(fetch_s, 4)
    return {
        "bound_s": round(bound, 4),
        "fraction": round(bound / measured_s, 3),
        "model_s": round(model, 4),
        "model_fraction": round(model / measured_s, 3),
        **detail,
    }


T_DISPATCH = 6.0e-3
"""Host seconds per deferred engine call (jit launch + argument staging
through the tunneled runtime), the per-block-pair model of the blocked
loop's `queue` phase. Calibrated once from the round-4 100M-row survey
proof (queue 1.38 s over 242 block pairs = 5.7 ms, rounded up); NOT
refit per round, so dispatch regressions flag against it."""

T_PAIR_BUILD = 8.0e-3
"""Host seconds per block pair for the pruned tile-pair list build
(`pairs` phase / block pairs). Calibrated once from the round-4 records
(7M survey: ~0.35 s over ~48 block pairs; 100M proof: 6.0 s over 242
WITH cross-sweep rebuilds), rounded to cover block-size variance; NOT
refit per round."""

SURVEY_REFERENCE = 1_000_000
SURVEY_UNKNOWN = 2_000_000
SURVEY_RANDOMS = 4_000_000
SURVEY_PATCHES = 96
SURVEY_RESIDENT = 24


def run_survey_scale(rooflines: dict, link: dict | None = None) -> dict:
    """BASELINE config #5, single-chip portion: 7M rows (1M reference +
    2M unknown + 4M HealPix-mask randoms), 96 patches, streamed through
    the blocked out-of-core engine path (`max_resident_patches`).

    The catalogs are DISK-CACHED (the production pattern at survey
    scale): the persistent packed-tile store then serves every warm
    run's row/column blocks from disk, as it would for any measurement
    over an ingested catalog — the cold run pays the one-time packing +
    store write. The warm wall is fully attributed: setup (catalog +
    linkage, ON the clock since round 5), the blocked loop's phase
    timers, and the n(z) post-processing; each phase carries a bound
    from live-calibrated rates so a regression flags against THIS
    machine's measured disk/link/host conditions instead of a prose
    constant (round-4 verdict, weak #3)."""
    import tempfile

    from yet_another_wizz_tpu import Catalog, Configuration
    from yet_another_wizz_tpu.correlation.measurements import (
        PatchLinkage,
        crosscorrelate,
    )
    from yet_another_wizz_tpu.examples import generate_mock_data
    from yet_another_wizz_tpu.randoms import HealPixRandoms
    from yet_another_wizz_tpu.redshifts import RedshiftData
    from yet_another_wizz_tpu.utils.healpix import pix2ang_ring

    t0 = time.perf_counter()
    cache_root = tempfile.mkdtemp(prefix="yawt_bench_survey_")
    mock = generate_mock_data(
        num_reference=SURVEY_REFERENCE,
        num_unknown=SURVEY_UNKNOWN,
        num_randoms=1,  # randoms drawn from the HealPix mask instead
        seed=777,
    )
    reference = Catalog.from_arrays(
        **mock["reference"], degrees=False, patch_num=SURVEY_PATCHES,
        cache_directory=os.path.join(cache_root, "reference"),
    )
    centers = reference.get_centers()
    unknown = Catalog.from_arrays(
        **mock["unknown"], degrees=False, patch_centers=centers,
        cache_directory=os.path.join(cache_root, "unknown"),
    )
    nside = 128
    colat, lon = pix2ang_ring(nside, np.arange(12 * nside * nside))
    pix_ra_deg = np.rad2deg(lon)
    pix_dec_deg = 90.0 - np.rad2deg(colat)
    mask = (
        (pix_ra_deg >= 40.0) & (pix_ra_deg <= 60.0)
        & (pix_dec_deg >= -10.0) & (pix_dec_deg <= 10.0)
    ).astype(float)
    generator = HealPixRandoms(
        mask, redshifts=mock["reference"]["redshifts"], seed=199
    )
    randoms = Catalog.from_random(
        os.path.join(cache_root, "randoms"), generator, SURVEY_RANDOMS,
        patch_centers=centers,
    )
    log(f"survey-scale setup (7M rows, cached): {time.perf_counter() - t0:.1f}s")

    config = Configuration.create(
        rmin=100, rmax=1000, unit="kpc",
        zmin=0.15, zmax=1.0, num_bins=NUM_BINS,
    )

    # corr/post split: every second of a run's wall lands in exactly one
    # bucket — setup (corr wall minus the blocked loop's own clock), the
    # blocked phases, or the n(z) post-processing
    timers = {"corr_wall": 0.0, "post": 0.0}
    last_w_sp = [None]  # for the isolated post-processing calibration

    def run():
        t0 = time.perf_counter()
        (w_sp,) = crosscorrelate(
            config, reference, unknown, ref_rand=randoms,
            max_resident_patches=SURVEY_RESIDENT,
        )
        t1 = time.perf_counter()
        nz = RedshiftData.from_corrfuncs(w_sp)
        t2 = time.perf_counter()
        timers["corr_wall"] += t1 - t0
        timers["post"] += t2 - t1
        last_w_sp[0] = w_sp
        return nz

    t0 = time.perf_counter()
    run()
    log(f"survey-scale (cold, incl. compile): {time.perf_counter() - t0:.2f}s")

    from yet_another_wizz_tpu.correlation import blocked
    from yet_another_wizz_tpu.utils import devicemem

    blocked.reset_phase_totals()
    devicemem.reset_peak()
    t_sv, all_times, num_stalled, reruns, nz, kept_phases = timed_stall_aware(
        run, runs=SURVEY_WARM_RUNS,
        snapshot=lambda: {**blocked.PHASE_TOTALS, **timers},
    )
    device_resident = devicemem.snapshot()
    lo, hi = min(all_times), max(all_times)
    num_timed = len(all_times)
    num_kept = max(num_timed - num_stalled, 1)
    # per-run phase attribution over the NON-STALLED runs only (the same
    # set the trimmed median covers): on the tunneled chip the link fetch
    # and device-queue wait dominate; locally attached hardware does not
    # pay them
    phases = per_run_phases(kept_phases or {}, num_kept)

    t_links0 = time.perf_counter()
    links = PatchLinkage.from_catalogs(config, reference, unknown, randoms)
    linkage_build_s = time.perf_counter() - t_links0
    work = [
        links.engine_work_stats(cat1, cat2, binned2=False)
        for cat1, cat2 in ((reference, unknown), (randoms, unknown))
    ]
    pairs = sum(w["candidate_pairs"] for w in work)
    pairs_per_s = pairs / t_sv
    rooflines["survey_scale"] = roofline(
        links.edges, pairs, t_sv, work_stats=work, link=link
    )
    log(
        f"survey-scale config (7M rows, HealPix-mask randoms, blocked "
        f"max_resident_patches={SURVEY_RESIDENT}): {t_sv:.2f}s trimmed "
        f"median of {num_timed} [{lo:.2f}, {hi:.2f}], {num_stalled} "
        f"stalled run(s), {reruns} rerun(s), {pairs:.3e} candidate pairs "
        f"-> {pairs_per_s:.3e} pairs/s, "
        f"roofline {rooflines['survey_scale']}, "
        f"n(z) finite: {bool(np.all(np.isfinite(nz.data)))}, "
        f"phases/run {phases}"
    )
    out = {
        "rows": SURVEY_REFERENCE + SURVEY_UNKNOWN + SURVEY_RANDOMS,
        "num_patches": SURVEY_PATCHES,
        "max_resident_patches": SURVEY_RESIDENT,
        "warm_median_s": [round(t_sv, 3), round(lo, 3), round(hi, 3)],
        "warm_runs_s": [round(t, 3) for t in all_times],
        "stall_detected": num_stalled,
        "reruns": reruns,
        "pairs_per_s": round(pairs_per_s, 1),
        "phases_per_run_s": phases,
        # framework-accounted HBM peak over the warm runs (the plugin's
        # memory_stats() is empty on the tunneled chip; see
        # utils/devicemem.py)
        "resident_device_bytes_peak": int(device_resident["peak_bytes"]),
        "resident_device_bytes_by_label": {
            key: int(value)
            for key, value in device_resident["peak_by_label"].items()
        },
    }

    # each of the warm runs above streams every catalog through the
    # host-device link once (fresh per-measurement cache): the honest
    # bound for THIS config on THIS link is the upload time of the
    # packed lanes in the active encoding (17 B/point fixed-point,
    # minus the elided uniform-weight and zero-bin lanes — 12 B/point
    # for unbinned unit-weight catalogs — + ~36 B/tile decode
    # parameters; or 32 B/point float)
    from yet_another_wizz_tpu.ops.tiles import (
        DEFAULT_TILE_SIZE,
        lane_encoding,
    )

    out["lane_encoding"] = lane_encoding()
    upload_mb = None
    if link and link.get("upload_mb_s"):
        if out["lane_encoding"] == "fixedpoint":
            # the mock reference/unknown carry per-point weights
            # (17 B/point); the unknown is unbinned, so its zero bin
            # lane is elided (-1 B/point -> 16). The randoms are
            # REFERENCE-side randoms: the RD count bins catalog1, and
            # HealPixRandoms carry redshifts, so their bin lane is
            # populated and NOT elided — they keep the int8 bin lane
            # and only elide the uniform weight lane
            # (ops/tiles.py:uniform_weight_fill) -> 13 B/point
            payload_bytes = (
                17.0 * SURVEY_REFERENCE
                + 16.0 * SURVEY_UNKNOWN
                + 13.0 * SURVEY_RANDOMS
            )
            param_bytes = 36.0 / DEFAULT_TILE_SIZE * out["rows"]
        else:
            payload_bytes = 32.0 * out["rows"]
            param_bytes = 0.0
        upload_mb = (payload_bytes + param_bytes) / 1e6
        out["link_bound_s"] = round(upload_mb / link["upload_mb_s"], 2)
        out["link_fraction"] = round(out["link_bound_s"] / t_sv, 3)

    # explained-wall decomposition (round 5): every second of the warm
    # wall lands in a named phase — setup (measurement entry -> blocked
    # loop), the blocked loop's own timers, and the n(z)
    # post-processing — and every phase carries a bound from THIS run's
    # live-calibrated conditions (disk read rate, link bandwidth, the
    # kernel roofline, direct re-measurement). A regression shows up as
    # a specific phase flagged over its bound, not as prose numbers
    # failing to reproduce on a different host allocation.
    top_level_phases = ("setup",) + BLOCKED_TOP_PHASES
    phase_sum = sum(phases.get(key, 0.0) for key in top_level_phases)
    phase_sum += phases.get("post", 0.0)
    explained = {
        "phase_sum_s": round(phase_sum, 2),
        "phase_fraction": round(phase_sum / t_sv, 3),
    }

    # live calibration: persistent-store disk read rate + stored bytes
    # per side (the warm rows/cols phases ARE store reads now)
    import glob as _glob

    def _store_files(name):
        return _glob.glob(
            os.path.join(cache_root, name, "tiles", "*", "block_*.npz")
        )

    store_read_mb_s = None
    row_files = _store_files("reference") + _store_files("randoms")
    col_files = _store_files("unknown")
    if row_files and col_files:
        probe_file = max(col_files, key=os.path.getsize)
        with open(probe_file, "rb") as f:  # page-cache warm, like a run
            f.read()
        t0 = time.perf_counter()
        with np.load(probe_file) as payload:
            for key in payload.files:
                payload[key]
        probe_s = time.perf_counter() - t0
        store_read_mb_s = os.path.getsize(probe_file) / 1e6 / max(
            probe_s, 1e-9
        )
    bounds = {"setup": round(linkage_build_s, 2)}
    if store_read_mb_s:
        bounds["rows"] = round(
            sum(os.path.getsize(p) for p in row_files) / 1e6
            / store_read_mb_s,
            2,
        )
        bounds["cols"] = round(
            sum(os.path.getsize(p) for p in col_files) / 1e6
            / store_read_mb_s,
            2,
        )
        out["store_read_mb_s"] = round(store_read_mb_s, 1)
    num_block_pairs = (kept_phases or {}).get("num_block_pairs", 0) / num_kept
    # per-block-pair host costs at the calibrated constants: pair-list
    # builds (pruned per block, memoised within a run) and the jitted
    # dispatch per deferred engine call
    bounds["pairs"] = round(num_block_pairs * T_PAIR_BUILD, 2)
    bounds["queue"] = round(num_block_pairs * T_DISPATCH, 2)
    if "link_bound_s" in out:
        bounds["drain"] = round(
            out["link_bound_s"] + rooflines["survey_scale"]["bound_s"], 2
        )
        drain_wait = phases.get("drain_wait", 0.0)
        if bounds["drain"] > 0:
            explained["drain_wait_vs_bound"] = round(
                drain_wait / bounds["drain"], 2
            )
    # post: float64 jackknife n(z) re-measured in isolation on the
    # last timed run's pair counts
    t0 = time.perf_counter()
    RedshiftData.from_corrfuncs(last_w_sp[0])
    bounds["post"] = round(time.perf_counter() - t0, 2)
    # the shared tunnel's bandwidth drifts minute-to-minute: re-probe
    # AFTER the timed runs and let the flag check consult the slower of
    # the two probes' drain bounds, so a mid-run link slowdown is
    # recorded as bracketed link drift instead of flagging the blocked
    # path (the recorded bounds stay the pre-run calibration)
    flag_bounds = {}
    import jax as _jax

    link_post = probe_link(_jax)
    out["link_post"] = link_post
    if upload_mb is not None and link_post.get("upload_mb_s"):
        out["link_bound_post_s"] = round(
            upload_mb / link_post["upload_mb_s"], 2
        )
        if "drain" in bounds:
            flag_bounds["drain"] = max(
                bounds["drain"],
                round(
                    out["link_bound_post_s"]
                    + rooflines["survey_scale"]["bound_s"],
                    2,
                ),
            )
    flags, link_phases_vs_bound = phase_flags(phases, bounds, flag_bounds)
    if link_phases_vs_bound is not None:
        explained["link_phases_vs_bound"] = link_phases_vs_bound
    explained["phase_bounds_s"] = bounds
    explained["phase_flags"] = flags
    out["explained"] = explained
    log(f"survey-scale explained wall: {explained}")

    # the production pattern for repeated measurements over the same
    # catalogs (e.g. every tomographic bin reuses the reference sample):
    # one ambient measurement_tile_cache shares packed + device-resident
    # blocks, so only the first measurement pays the link
    from yet_another_wizz_tpu.correlation.blocked import (
        measurement_tile_cache,
    )

    with measurement_tile_cache():
        run()  # populates the session cache
        blocked.reset_phase_totals()
        # stall-aware like the uncached runs: one tunnel stall must not
        # inflate the recorded session-cache phases or the
        # drain-vs-kernel-bound link-health indicator
        (
            t_shared, shared_times, shared_stalled, shared_reruns, _,
            shared_kept,
        ) = timed_stall_aware(
            run, runs=3,
            snapshot=lambda: {**blocked.PHASE_TOTALS, **timers},
        )
    out["shared_cache_warm_s"] = [
        round(t_shared, 3),
        round(min(shared_times), 3),
        round(max(shared_times), 3),
    ]
    out["shared_cache_stalls"] = shared_stalled
    # phase attribution for the session-cached runs too (the wall the
    # CLI pipeline's tomographic bins actually pay): rows/cols are
    # cache hits (~0), pairs is memoised after the populate run, so
    # the remaining wall is dispatch (queue) + the device drain. With
    # zero upload work the drain's honest bound is the kernel roofline
    # plus the accumulator fetch — recorded as the vs-bound ratio.
    shared_phases = per_run_phases(
        shared_kept or {},
        max(len(shared_times) - shared_stalled, 1),
    )
    out["shared_cache_phases_s"] = shared_phases
    shared_drain_bound = (
        rooflines["survey_scale"]["bound_s"]
        + shared_phases.get("drain_fetch", 0.0)
    )
    if shared_drain_bound > 0:
        out["shared_cache_drain_vs_kernel_bound"] = round(
            shared_phases.get("drain_wait", 0.0) / shared_drain_bound, 2
        )
    log(
        f"survey-scale with a session tile cache (catalogs cross the "
        f"link once): {t_shared:.2f}s trimmed warm median "
        f"[{min(shared_times):.2f}, {max(shared_times):.2f}], "
        f"{shared_stalled} stalled, phases/run {shared_phases}"
        + (
            f"; per-measurement link bound {out['link_bound_s']:.1f}s "
            f"(fraction {out['link_fraction']:.2f} of the uncached run)"
            if "link_bound_s" in out else ""
        )
    )

    import shutil

    shutil.rmtree(cache_root, ignore_errors=True)
    return out


def probe_link(jax) -> dict:
    """Median round-trip latency and fetch bandwidth of the host-device
    link. On the tunneled chip used for CI benches these dominate the
    warm wall-clock of small configs (every result fetch pays a full
    RTT) and swing between runs — recording them alongside the timings
    lets a regression in OUR code be told apart from a slow tunnel day."""
    import jax.numpy as jnp

    tiny = jax.device_put(jnp.zeros((), jnp.float32))
    jax.device_get(tiny)  # connection warm-up
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.device_get(tiny)
        rtts.append(time.perf_counter() - t0)

    big = jax.device_put(jnp.zeros((4 << 20,), jnp.float32))  # 16 MiB
    big.block_until_ready()
    t0 = time.perf_counter()
    jax.device_get(big)
    fetch_s = time.perf_counter() - t0
    rtt = float(np.median(rtts))

    host = np.zeros((4 << 20,), np.float32)
    t0 = time.perf_counter()
    jax.device_put(host).block_until_ready()
    upload_s = time.perf_counter() - t0
    return {
        "rtt_ms": round(rtt * 1e3, 2),
        "fetch_mb_s": round(16.0 / max(fetch_s - rtt, 1e-9), 1),
        "upload_mb_s": round(16.0 / max(upload_s - rtt, 1e-9), 1),
    }


def main() -> None:
    import jax

    from yet_another_wizz_tpu import Catalog, Configuration
    from yet_another_wizz_tpu.correlation.measurements import (
        PatchLinkage,
        crosscorrelate,
    )
    from yet_another_wizz_tpu.ops.cpu_oracle import (
        count_pairs_oracle_multiprocess,
    )
    from yet_another_wizz_tpu.ops.linkage import build_tile_pairs
    from yet_another_wizz_tpu.ops.paircount import _unpack_tileset
    from yet_another_wizz_tpu.examples import generate_mock_data
    from yet_another_wizz_tpu.redshifts import RedshiftData

    log(f"jax backend: {jax.default_backend()} devices: {jax.devices()}")
    link = probe_link(jax)
    log(
        f"device link: rtt {link['rtt_ms']:.1f} ms, "
        f"fetch bandwidth {link['fetch_mb_s']:.0f} MB/s"
    )

    t0 = time.perf_counter()
    mock = generate_mock_data(
        num_reference=NUM_REFERENCE,
        num_unknown=NUM_UNKNOWN,
        num_randoms=NUM_RANDOMS,
        seed=12345,
    )
    log(f"mock generation: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    reference = Catalog.from_arrays(
        **mock["reference"], degrees=False, patch_num=NUM_PATCHES
    )
    centers = reference.get_centers()
    unknown = Catalog.from_arrays(
        **mock["unknown"], degrees=False, patch_centers=centers
    )
    randoms = Catalog.from_arrays(
        **mock["randoms"], degrees=False, patch_centers=centers
    )
    log(f"catalog construction: {time.perf_counter() - t0:.1f}s")

    config = Configuration.create(
        rmin=100, rmax=1000, unit="kpc",
        zmin=0.15, zmax=1.0, num_bins=NUM_BINS,
    )

    def run_measurement():
        (w_sp,) = crosscorrelate(
            config, reference, unknown, ref_rand=randoms, backend="auto"
        )
        return RedshiftData.from_corrfuncs(w_sp)

    # warm-up (compiles cached across runs via the persistent cache)
    t0 = time.perf_counter()
    run_measurement()
    log(f"TPU measurement (cold, incl. compile): {time.perf_counter() - t0:.2f}s")

    t_tpu, t_lo, t_hi, nz = timed_median(run_measurement)
    log(
        f"TPU measurement (warm, median of {WARM_RUNS}): {t_tpu:.2f}s "
        f"[{t_lo:.2f}, {t_hi:.2f}]"
    )
    log(f"n(z) head: {np.round(nz.data[:4], 4)}")
    warm_medians = {"wsp_jackknife": [round(t_tpu, 3), round(t_lo, 3), round(t_hi, 3)]}

    # covariance configurations (BASELINE config #3): jackknife is part of
    # the primary metric; bootstrap resampling timed separately
    (w_sp_counts,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="auto"
    )
    t0 = time.perf_counter()
    nz_boot = RedshiftData.from_corrfuncs(
        w_sp_counts, method="bootstrap", num_samples=500
    )
    log(
        f"bootstrap covariance (500 samples over {NUM_PATCHES} patches): "
        f"{time.perf_counter() - t0:.2f}s, "
        f"median err ratio boot/jack "
        f"{np.nanmedian(nz_boot.error / nz.error):.2f}"
    )

    # work statistics: candidate pairs actually evaluated by the engine —
    # the SAME pruned tile-pair lists the timed measurement processes
    # (tile layout choice and per-tile redshift pruning included)
    links = PatchLinkage.from_catalogs(config, reference, unknown, randoms)
    binning = config.binning.binning
    work = [
        links.engine_work_stats(cat1, cat2, binned2=False)
        for cat1, cat2 in ((reference, unknown), (randoms, unknown))
    ]
    stats_pairs = sum(w["candidate_pairs"] for w in work)
    pairs_per_sec = stats_pairs / t_tpu
    log(f"candidate pairs: {stats_pairs:.3e} -> {pairs_per_sec:.3e} pairs/s")
    rooflines = {
        "wsp_jackknife": roofline(
            links.edges, stats_pairs, t_tpu, work_stats=work, link=link
        )
    }
    log(f"roofline (wsp): {rooflines['wsp_jackknife']}")

    # CPU baseline: identical DD + RD counts via multiprocess scipy
    # kd-trees; doubles as a float64 validation of the device counts
    log("running multiprocess CPU baseline (scipy kd-trees)...")
    from yet_another_wizz_tpu.ops.paircount import count_pairs_tiles

    edges = links.edges.edges
    t_cpu = 0.0
    max_rel_err = 0.0
    for cat1, cat2 in ((reference, unknown), (randoms, unknown)):
        ts1 = cat1.get_tiles(binning)
        ts2 = cat2.get_tiles(None)
        pairs = build_tile_pairs(ts1, ts2, links.linkage, auto=False)
        xyz1, w1, z1, p1 = _unpack_tileset(ts1)
        xyz2, w2, _, p2 = _unpack_tileset(ts2)
        t0 = time.perf_counter()
        oracle = count_pairs_oracle_multiprocess(
            xyz1, w1, z1, p1, xyz2, w2, None, p2, pairs.slot_patches, edges
        )
        t_cpu += time.perf_counter() - t0
        engine = count_pairs_tiles(
            ts1, ts2, pairs, links.edges.chord2_table
        )
        # compare the per-scale counts (cumulative differences), the
        # quantity that enters the estimators
        scale_e = links.edges.counts_to_scales(engine).sum(axis=1)
        scale_o = links.edges.counts_to_scales(oracle).sum(axis=1)
        rel = np.abs(scale_e - scale_o) / np.maximum(np.abs(scale_o), 1e-30)
        max_rel_err = max(max_rel_err, float(rel[scale_o > 0].max()))
    log(f"CPU baseline (multiprocess kd-trees): {t_cpu:.2f}s")
    log(f"device counts vs float64 oracle: max rel err {max_rel_err:.2e}")

    # secondary configuration (BASELINE config #2): reference-sample
    # autocorrelation with RR counts and the Landy-Szalay estimator
    from yet_another_wizz_tpu.correlation.measurements import autocorrelate

    def run_autocorr():
        (w_ss,) = autocorrelate(config, reference, randoms)
        return w_ss.sample()

    run_autocorr()
    t_ss, lo, hi, w_ss_data = timed_median(run_autocorr)
    warm_medians["wss_landy_szalay"] = [round(t_ss, 3), round(lo, 3), round(hi, 3)]
    log(
        f"secondary config w_ss (DD+DR+RR, Landy-Szalay): "
        f"{t_ss:.2f}s warm median [{lo:.2f}, {hi:.2f}], "
        f"mean amplitude {np.nanmean(w_ss_data.data):.4f}"
    )

    # secondary configuration (BASELINE config #4): multiple angular
    # scale ranges with power-law separation weighting (rweight)
    config_multi = Configuration.create(
        rmin=[100, 300, 500], rmax=[300, 500, 1000], unit="kpc",
        rweight=-1.0, resolution=32,
        zmin=0.15, zmax=1.0, num_bins=NUM_BINS,
    )

    multi_sample_s = [0.0]

    def run_multiscale():
        scales = crosscorrelate(
            config_multi, reference, unknown, ref_rand=randoms
        )
        t0 = time.perf_counter()
        sampled = [w.sample() for w in scales]
        multi_sample_s[0] = time.perf_counter() - t0
        return sampled

    run_multiscale()
    t_ms, lo, hi, multi = timed_median(run_multiscale)
    warm_medians["multiscale_rweight"] = [round(t_ms, 3), round(lo, 3), round(hi, 3)]
    links_multi = PatchLinkage.from_catalogs(
        config_multi, reference, unknown, randoms
    )
    work_multi = [
        links_multi.engine_work_stats(cat1, cat2, binned2=False)
        for cat1, cat2 in ((reference, unknown), (randoms, unknown))
    ]
    multi_pairs = sum(w["candidate_pairs"] for w in work_multi)
    rooflines["multiscale_rweight"] = roofline(
        links_multi.edges, multi_pairs, t_ms, work_stats=work_multi,
        link=link,
    )
    # residual attribution (wall - bound), same decomposition as the
    # 256-patch stress config: measured host costs the per-pair model
    # excludes — float64 estimator sampling of 3 scales x (DD+RD) and
    # the warm pair-list rebuild; the remainder is device execution
    # beyond the per-op bound (transcendental/pipeline throughput the
    # flat op model undercounts) plus launch dispatch and index upload —
    # scripts/experiment_exec_split.py separates the two directly
    t0 = time.perf_counter()
    for cat1, cat2 in ((reference, unknown), (randoms, unknown)):
        links_multi._build_engine_inputs(
            cat1, cat2, auto=False, binned2=False, mode="nn"
        )
    multi_pair_build_s = time.perf_counter() - t0
    rooflines["multiscale_rweight"]["residual_s"] = {
        "sample_post": round(multi_sample_s[0], 4),
        "pair_build": round(multi_pair_build_s, 4),
        "kernel_gap_and_dispatch": round(
            max(
                t_ms
                - rooflines["multiscale_rweight"]["bound_s"]
                - multi_sample_s[0]
                - multi_pair_build_s,
                0.0,
            ),
            4,
        ),
    }
    log(
        f"secondary config multi-scale rweight ({len(multi)} scale ranges, "
        f"theta^-1 weighting): {t_ms:.2f}s warm median [{lo:.2f}, {hi:.2f}], "
        f"amplitudes {[round(float(np.nanmean(m.data)), 1) for m in multi]}, "
        f"counting={'direct' if links_multi.edges.direct else 'cumulative'}, "
        f"roofline {rooflines['multiscale_rweight']}"
    )

    # secondary configuration (BASELINE config #5 ingredient): randoms
    # drawn from a HEALPix probability map through the full measurement
    from yet_another_wizz_tpu.randoms import HealPixRandoms
    from yet_another_wizz_tpu.utils.healpix import pix2ang_ring

    nside = 64
    colat, lon = pix2ang_ring(nside, np.arange(12 * nside * nside))
    pix_ra_deg = np.rad2deg(lon)
    pix_dec_deg = 90.0 - np.rad2deg(colat)
    pixel_map = (
        (pix_ra_deg >= 40.0) & (pix_ra_deg <= 60.0)
        & (pix_dec_deg >= -10.0) & (pix_dec_deg <= 10.0)
    ).astype(float)
    generator = HealPixRandoms(
        pixel_map, redshifts=mock["reference"]["redshifts"], seed=99
    )
    hp_rand = Catalog.from_random(
        None, generator, NUM_RANDOMS,
        patch_centers=reference.get_centers(),
    )

    def run_healpix():
        (w_sp,) = crosscorrelate(
            config, reference, unknown, ref_rand=hp_rand
        )
        return RedshiftData.from_corrfuncs(w_sp)

    run_healpix()
    t_hp, lo, hi, nz_hp = timed_median(run_healpix)
    warm_medians["healpix_randoms"] = [round(t_hp, 3), round(lo, 3), round(hi, 3)]
    log(
        f"secondary config HealPix-map randoms ({NUM_RANDOMS} drawn at "
        f"nside={nside}): {t_hp:.2f}s warm median [{lo:.2f}, {hi:.2f}], "
        f"n(z) corr vs box-randoms "
        f"{np.corrcoef(nz_hp.data, nz.data)[0, 1]:.3f}"
    )

    # stress configuration: 256 patches (finer patch decomposition:
    # thousands of linked patch-pair slots, shorter same-slot kernel
    # runs) on the same mock
    reference_256 = Catalog.from_arrays(
        **mock["reference"], degrees=False, patch_num=256
    )
    centers_256 = reference_256.get_centers()
    unknown_256 = Catalog.from_arrays(
        **mock["unknown"], degrees=False, patch_centers=centers_256
    )
    randoms_256 = Catalog.from_arrays(
        **mock["randoms"], degrees=False, patch_centers=centers_256
    )

    stress_nz_s = [0.0]

    def run_stress():
        (w_sp,) = crosscorrelate(
            config, reference_256, unknown_256, ref_rand=randoms_256
        )
        t0 = time.perf_counter()
        nz_stress = RedshiftData.from_corrfuncs(w_sp)
        stress_nz_s[0] = time.perf_counter() - t0
        return nz_stress

    run_stress()
    t_256, lo, hi, nz_256 = timed_median(run_stress)
    warm_medians["stress_256_patches"] = [round(t_256, 3), round(lo, 3), round(hi, 3)]
    links_256 = PatchLinkage.from_catalogs(
        config, reference_256, unknown_256, randoms_256
    )
    work_256 = [
        links_256.engine_work_stats(cat1, cat2, binned2=False)
        for cat1, cat2 in (
            (reference_256, unknown_256), (randoms_256, unknown_256)
        )
    ]
    stress_pairs = sum(w["candidate_pairs"] for w in work_256)
    stress_pairs_per_sec = stress_pairs / t_256
    rooflines["stress_256_patches"] = roofline(
        links_256.edges, stress_pairs, t_256, work_stats=work_256,
        link=link,
    )
    # residual attribution (wall - bound): measured host-side costs the
    # roofline deliberately excludes — float64 jackknife post-processing
    # and the warm pair-list rebuild; what remains after those is device
    # execution beyond the per-op bound plus launch dispatch and
    # index-list upload (documented in BASELINE.md; the exec/dispatch
    # split is measured by scripts/experiment_exec_split.py)
    t0 = time.perf_counter()
    for cat1, cat2 in (
        (reference_256, unknown_256), (randoms_256, unknown_256)
    ):
        links_256._build_engine_inputs(
            cat1, cat2, auto=False, binned2=False, mode="nn"
        )
    pair_build_s = time.perf_counter() - t0
    rooflines["stress_256_patches"]["residual_s"] = {
        "nz_post": round(stress_nz_s[0], 4),
        "pair_build": round(pair_build_s, 4),
        "kernel_gap_and_dispatch": round(
            max(
                t_256
                - rooflines["stress_256_patches"]["bound_s"]
                - stress_nz_s[0]
                - pair_build_s,
                0.0,
            ),
            4,
        ),
    }
    log(
        f"stress config 256 patches: {t_256:.2f}s warm median "
        f"[{lo:.2f}, {hi:.2f}], {stress_pairs:.3e} candidate pairs "
        f"-> {stress_pairs_per_sec:.3e} pairs/s, "
        f"n(z) corr vs 64-patch {np.corrcoef(nz_256.data, nz.data)[0, 1]:.3f}, "
        f"roofline {rooflines['stress_256_patches']}"
    )

    # survey-scale configuration (BASELINE config #5, single-chip
    # portion): 7M rows total, HealPix-mask randoms, blocked out-of-core
    # path (device/host memory bounded at one patch-block pair)
    survey_scale = run_survey_scale(rooflines, link)
    warm_medians["survey_scale"] = survey_scale["warm_median_s"]

    result = {
        "metric": (
            "weighted pairs/sec/chip; mock w_sp(z) DD+RD + jackknife "
            "covariance wall-clock"
        ),
        "value": round(pairs_per_sec, 1),
        "unit": "candidate pairs/s",
        "vs_baseline": round(t_cpu / t_tpu, 2),
        # the inputs of vs_baseline, so round-over-round changes in the
        # ratio can be attributed: the CPU baseline is re-measured live
        # and varies with ambient machine load
        "cpu_baseline_s": round(t_cpu, 2),
        "tpu_warm_s": round(t_tpu, 4),
        "warm_medians_s": warm_medians,
        "warm_runs": WARM_RUNS,
        "stress_256_pairs_per_s": round(stress_pairs_per_sec, 1),
        "survey_scale": survey_scale,
        "roofline": rooflines,
        "link": link,
        "oracle_max_rel_err": float(f"{max_rel_err:.3e}"),
    }

    # the one-shot out-of-core proofs at full survey scale (40M/70M/100M
    # rows; too slow for the bench loop) are recorded by
    # scripts/survey_proof.py and committed — embed their DIGESTS so the
    # stdout line stays compact and strictly parseable (round 4 embedded
    # the full records, grew the line to 9.5 KB, and the driver artifact
    # came back `parsed: null`); the full records remain in the
    # committed BENCH_oneshot_*.json files and in BENCH_record.json.
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    proofs = {}
    for proof in sorted(glob.glob(os.path.join(here, "BENCH_oneshot_*.json"))):
        with open(proof) as f:
            proofs[os.path.basename(proof)] = json.load(f)
    if proofs:
        result["survey_proofs"] = {
            name: proof_digest(rec) for name, rec in proofs.items()
        }
        result["survey_proof"] = proof_digest(max(
            proofs.values(),
            key=lambda rec: rec.get("total_rows_requested", 0),
        ))

    line = emit_record(
        result, full_record_path=os.path.join(here, "BENCH_record.json")
    )
    print(line, flush=True)


if __name__ == "__main__":
    main()
