"""Blocked (device-memory-bounded) measurement path equals the in-memory
engine path."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu import Catalog, Configuration
from yet_another_wizz_tpu.correlation.measurements import (
    autocorrelate,
    crosscorrelate,
)
from yet_another_wizz_tpu.examples import generate_mock_data


@pytest.fixture(scope="module")
def catalogs():
    mock = generate_mock_data(
        num_reference=4000, num_unknown=6000, num_randoms=9000, seed=21
    )
    reference = Catalog.from_arrays(
        **mock["reference"], degrees=False, patch_num=12
    )
    centers = reference.get_centers()
    unknown = Catalog.from_arrays(
        **mock["unknown"], degrees=False, patch_centers=centers
    )
    randoms = Catalog.from_arrays(
        **mock["randoms"], degrees=False, patch_centers=centers
    )
    return reference, unknown, randoms


@pytest.fixture(scope="module")
def config():
    return Configuration.create(
        rmin=500, rmax=3000, unit="kpc", zmin=0.15, zmax=1.0, num_bins=4
    )


@pytest.mark.parametrize("max_resident", [4, 6, 24])
def test_cross_blocked_equals_in_memory(catalogs, config, max_resident):
    reference, unknown, randoms = catalogs
    (full,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla"
    )
    (blocked,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=max_resident,
    )
    assert_allclose(
        blocked.dd.counts.counts, full.dd.counts.counts, rtol=1e-6, atol=1e-3
    )
    assert_allclose(
        blocked.rd.counts.counts, full.rd.counts.counts, rtol=1e-6, atol=1e-3
    )
    assert_allclose(
        blocked.dd.sum_weights.sum_weights1,
        full.dd.sum_weights.sum_weights1,
        rtol=1e-12,
    )
    sample_full = full.sample()
    sample_blocked = blocked.sample()
    assert_allclose(sample_blocked.data, sample_full.data, rtol=1e-6)
    assert_allclose(sample_blocked.samples, sample_full.samples, rtol=1e-5)


def test_phase_totals_accumulate(catalogs, config):
    from yet_another_wizz_tpu.correlation import blocked as blocked_mod

    reference, unknown, randoms = catalogs
    blocked_mod.reset_phase_totals()
    assert blocked_mod.PHASE_TOTALS == {}
    crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=2,
    )
    totals = blocked_mod.PHASE_TOTALS
    # two counts (DD, RD) ran; totals cover both and all phases exist
    assert totals["num_block_pairs"] > 0
    assert totals["candidate_pairs"] > 0  # engine work statistic
    for key in ("rows", "cols", "pairs", "queue", "drain",
                "drain_wait", "drain_fetch", "drain_scatter"):
        assert totals[key] >= 0.0
    assert totals["drain"] > 0.0


@pytest.mark.parametrize("depth", ["3", "8"])
def test_prefetch_depth_knob(catalogs, config, monkeypatch, depth):
    """``YAWT_PREFETCH_BLOCKS`` > 1 keeps several packed blocks in
    flight on two workers per side; the schedule change must not affect
    the counts (cross AND auto shape, where row/column twin handling is
    exercised under concurrent builds)."""
    reference, unknown, randoms = catalogs
    (full,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla"
    )
    (full_auto,) = autocorrelate(config, reference, randoms, backend="xla")
    monkeypatch.setenv("YAWT_PREFETCH_BLOCKS", depth)
    (deep,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    (deep_auto,) = autocorrelate(
        config, reference, randoms, backend="xla", max_resident_patches=4
    )
    assert_allclose(
        deep.dd.counts.counts, full.dd.counts.counts, rtol=1e-6, atol=1e-3
    )
    assert_allclose(
        deep.rd.counts.counts, full.rd.counts.counts, rtol=1e-6, atol=1e-3
    )
    assert_allclose(
        deep_auto.dd.counts.counts, full_auto.dd.counts.counts,
        rtol=1e-6, atol=1e-3,
    )
    assert_allclose(deep.sample().data, full.sample().data, rtol=1e-6)


def test_auto_blocked_equals_in_memory(catalogs, config):
    reference, _, randoms = catalogs
    (full,) = autocorrelate(config, reference, randoms, backend="xla")
    (blocked,) = autocorrelate(
        config, reference, randoms, backend="xla", max_resident_patches=5
    )
    assert_allclose(
        blocked.dd.counts.counts, full.dd.counts.counts, rtol=1e-6, atol=1e-3
    )
    assert_allclose(
        blocked.rr.counts.counts, full.rr.counts.counts, rtol=1e-6, atol=1e-3
    )
    assert_allclose(blocked.sample().data, full.sample().data, rtol=1e-6)


def test_device_accumulate_escape_hatch(catalogs, config, monkeypatch):
    """The on-device result accumulation (default) and the per-block-pair
    host fetch (``YAWT_DEVICE_ACCUMULATE=0``) are two drain modes of the
    same measurement — both must match the in-memory engine path."""
    reference, unknown, randoms = catalogs
    (full,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla"
    )
    monkeypatch.setenv("YAWT_DEVICE_ACCUMULATE", "0")
    (host_mode,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    monkeypatch.setenv("YAWT_DEVICE_ACCUMULATE", "1")
    (device_mode,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    for blocked in (host_mode, device_mode):
        assert_allclose(
            blocked.dd.counts.counts, full.dd.counts.counts,
            rtol=1e-6, atol=1e-3,
        )
        assert_allclose(blocked.sample().data, full.sample().data, rtol=1e-6)
    # the two drain modes differ only in float32-vs-float64 reduction
    # order: tighter than either is to the engine baseline
    assert_allclose(
        device_mode.dd.counts.counts, host_mode.dd.counts.counts,
        rtol=1e-6, atol=1e-4,
    )


def test_direct_counting_blocked_accumulate(catalogs, config):
    """Separation-weighted configs past the direct-counting crossover run
    the direct mapper through the blocked loop; with the on-device
    accumulation its scale reduction happens on device too and must match
    the in-memory result."""
    reference, unknown, randoms = catalogs
    weighted = config.modify(rweight=-1.0, resolution=16)
    (full,) = crosscorrelate(
        weighted, reference, unknown, ref_rand=randoms, backend="xla"
    )
    (blocked,) = crosscorrelate(
        weighted, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    assert_allclose(
        blocked.dd.counts.counts, full.dd.counts.counts, rtol=1e-6, atol=1e-3
    )
    assert_allclose(
        blocked.rd.counts.counts, full.rd.counts.counts, rtol=1e-6, atol=1e-3
    )
    assert_allclose(blocked.sample().data, full.sample().data, rtol=1e-6)


def test_audit_through_public_api(catalogs, config):
    reference, unknown, randoms = catalogs
    (plain,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla"
    )
    (audited,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        audit=True,
    )
    # random mock data: at most accumulation-level differences
    assert_allclose(
        audited.dd.counts.counts, plain.dd.counts.counts,
        rtol=1e-5, atol=1e-2,
    )
    assert_allclose(audited.sample().data, plain.sample().data, rtol=1e-4)


def test_audit_through_blocked_mode(catalogs, config):
    """The exact-boundary audit composes with the blocked path: per
    block pair the float64 repair runs on the local counts, and the
    result matches the in-memory audited measurement."""
    reference, _, randoms = catalogs
    (plain,) = autocorrelate(
        config, reference, randoms, backend="xla", audit=True
    )
    (blocked,) = autocorrelate(
        config, reference, randoms, backend="xla", audit=True,
        max_resident_patches=5,
    )
    assert_allclose(
        blocked.dd.counts.counts, plain.dd.counts.counts,
        rtol=1e-6, atol=1e-6,
    )
    assert_allclose(blocked.sample().data, plain.sample().data, rtol=1e-5)


def test_column_tile_cache_round_trip(catalogs, config):
    """The disk-spilled column tile sets reload bit-identically and the
    cache actually serves the revisits (hits > 0 with multiple row
    blocks); a zero-byte cap disables caching without changing results."""
    import tempfile

    from yet_another_wizz_tpu.binning import Binning
    from yet_another_wizz_tpu.correlation.blocked import (
        _ColumnTileCache, _build_block_tiles, count_pairs_blocked,
    )
    from yet_another_wizz_tpu.correlation.measurements import PatchLinkage

    reference, unknown, randoms = catalogs
    links = PatchLinkage.from_catalogs(config, reference, unknown)
    binning = config.binning.binning

    # round trip one block through the cache
    tiles = _build_block_tiles(reference, binning, "n", 0, 4, 64)
    with tempfile.TemporaryDirectory() as tmp:
        cache = _ColumnTileCache(tmp, 1 << 30)
        assert cache.load(0) is None and cache.misses == 1
        cache.store(0, tiles)
        loaded = cache.load(0)
        assert cache.hits == 1
        np.testing.assert_array_equal(loaded.lane_data, tiles.lane_data)
        np.testing.assert_array_equal(loaded.tile_patch, tiles.tile_patch)
        np.testing.assert_array_equal(
            loaded.sum_weights, tiles.sum_weights
        )
        assert loaded.num_bins == tiles.num_bins
        assert loaded.tile_size == tiles.tile_size
        assert loaded.sum_kappa is None

        # a full cap refuses further blocks without erroring
        tiny = _ColumnTileCache(tmp, 1)
        tiny.store(1, tiles)
        assert tiny.load(1) is None

    # identical results with and without the cache
    kwargs = dict(
        auto=False, binned2=False, max_resident_patches=4, backend="xla"
    )
    cached = count_pairs_blocked(
        links.edges, links.linkage, reference, unknown, binning, **kwargs
    )
    uncached = count_pairs_blocked(
        links.edges, links.linkage, reference, unknown, binning,
        tile_cache_bytes=0, resident_tile_bytes=0, **kwargs,
    )
    np.testing.assert_allclose(cached, uncached, rtol=1e-6, atol=1e-6)


def test_ambient_cache_shared_across_measurements(catalogs, config):
    """A measurement_tile_cache held open around SEVERAL measurements is
    picked up as the ambient cache: a repeated measurement rebuilds no
    blocks (every load hits), even through a different-but-equal
    Configuration (binning is keyed by value, not object identity), and
    the results are unchanged."""
    from yet_another_wizz_tpu.correlation.blocked import (
        active_tile_cache, measurement_tile_cache,
    )

    reference, unknown, randoms = catalogs
    kwargs = dict(backend="xla", max_resident_patches=4)
    (plain,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, **kwargs
    )

    assert active_tile_cache() is None
    with measurement_tile_cache(resident_tile_bytes=1 << 30) as cache:
        assert active_tile_cache() is cache
        (first,) = crosscorrelate(
            config, reference, unknown, ref_rand=randoms, **kwargs
        )
        misses_first = cache.misses
        assert misses_first > 0  # the first measurement packed blocks

        twin_config = Configuration.create(
            rmin=500, rmax=3000, unit="kpc", zmin=0.15, zmax=1.0, num_bins=4
        )
        (second,) = crosscorrelate(
            twin_config, reference, unknown, ref_rand=randoms, **kwargs
        )
        assert cache.misses == misses_first  # served entirely from cache
        assert cache.hits > 0
    assert active_tile_cache() is None

    assert_allclose(
        first.dd.counts.counts, plain.dd.counts.counts, rtol=1e-6, atol=1e-6
    )
    assert_allclose(
        second.dd.counts.counts, plain.dd.counts.counts, rtol=1e-6, atol=1e-6
    )


def test_shared_cache_distinguishes_tile_size(catalogs, config):
    """A measurement-scoped cache serving calls with different tile
    sizes must key them apart (a cached TileSet packed at the wrong
    tile size feeds the engine mismatched lane shapes); the catalogs
    are keyed weakly so the cache never extends their lifetime."""
    from yet_another_wizz_tpu.correlation.blocked import (
        count_pairs_blocked, measurement_tile_cache,
    )
    from yet_another_wizz_tpu.correlation.measurements import PatchLinkage

    reference, unknown, _ = catalogs
    binning = config.binning.binning
    links = PatchLinkage.from_catalogs(config, reference, unknown)
    kwargs = dict(
        auto=False, binned2=False, max_resident_patches=4, backend="xla"
    )
    expected = count_pairs_blocked(
        links.edges, links.linkage, reference, unknown, binning,
        tile_size=64, **kwargs,
    )
    with measurement_tile_cache(resident_tile_bytes=1 << 30) as cache:
        first = count_pairs_blocked(
            links.edges, links.linkage, reference, unknown, binning,
            tile_size=128, cache=cache, **kwargs,
        )
        second = count_pairs_blocked(
            links.edges, links.linkage, reference, unknown, binning,
            tile_size=64, cache=cache, **kwargs,
        )
        # keys hold weak identity tokens, not the catalogs themselves
        from yet_another_wizz_tpu.correlation.blocked import _WeakId

        assert all(
            isinstance(key[0], _WeakId) for key in cache._resident
        )
    np.testing.assert_allclose(first, expected, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(second, expected, rtol=1e-6, atol=1e-6)


def test_stale_generation_eviction(catalogs, config):
    """Under budget pressure the cache evicts entries of PREVIOUS
    counts (generations) to admit the current count's blocks — a
    session-long cache must not let one measurement's blocks starve
    later measurements of caching — while entries of the current
    generation are never evicted."""
    from yet_another_wizz_tpu.correlation.blocked import (
        _ColumnTileCache, _build_block_tiles,
    )

    reference, _, _ = catalogs
    binning = config.binning.binning
    tiles = _build_block_tiles(reference, binning, "n", 0, 4, 64)
    nbytes = _ColumnTileCache._device_nbytes(tiles)

    cache = _ColumnTileCache(None, 0, resident_bytes=nbytes + nbytes // 2)
    token = cache.begin_count()
    cache.store("a", tiles)
    assert cache.load("a", count=False) is tiles
    # same generation: "a" is protected, "b" is simply not admitted
    cache.store("b", tiles)
    assert cache.load("b", count=False) is None
    assert cache.load("a", count=False) is tiles
    cache.end_count(token)
    # next count: "a" is stale and evicted to make room for "c"
    token = cache.begin_count()
    cache.store("c", tiles)
    assert cache.load("c", count=False) is tiles
    assert cache.load("a", count=False) is None
    cache.end_count(token)
    # a stale entry REVISITED by the current count is re-protected
    token = cache.begin_count()
    assert cache.load("c", count=False) is tiles  # stamps current gen
    cache.store("d", tiles)
    assert cache.load("d", count=False) is None  # "c" was protected
    cache.end_count(token)


def test_blocked_entry_validation(catalogs, config):
    """The exported blocked entry point rejects inputs the in-memory
    path rejects: mismatched patch counts (silent data loss otherwise),
    invalid counting modes, and binned counting without redshifts."""
    from yet_another_wizz_tpu.correlation.blocked import (
        _build_block_tiles, count_pairs_blocked,
    )
    from yet_another_wizz_tpu.correlation.measurements import PatchLinkage

    reference, unknown, _ = catalogs
    binning = config.binning.binning
    links = PatchLinkage.from_catalogs(config, reference, unknown)

    mock = generate_mock_data(
        num_reference=1, num_unknown=500, num_randoms=1, seed=5
    )
    fewer = Catalog.from_arrays(
        **mock["unknown"], degrees=False, patch_num=3
    )
    with pytest.raises(ValueError, match="patch counts"):
        count_pairs_blocked(
            links.edges, links.linkage, reference, fewer, binning,
            auto=False, binned2=False, max_resident_patches=4,
        )

    with pytest.raises(ValueError, match="invalid counting mode"):
        _build_block_tiles(reference, binning, "a", 0, 4, 64)

    mock_noz = dict(mock["unknown"])
    mock_noz.pop("redshifts", None)
    no_z = Catalog.from_arrays(
        ra=mock_noz["ra"], dec=mock_noz["dec"], degrees=False, patch_num=3
    )
    with pytest.raises(ValueError, match="redshifts"):
        _build_block_tiles(no_z, binning, "n", 0, 3, 64)


def test_direct_blocked_call_uses_ambient_cache(catalogs, config):
    """count_pairs_blocked called DIRECTLY (not through a measurement)
    inside a measurement_tile_cache context picks up the ambient cache —
    the context's sharing promise holds for both entry points."""
    from yet_another_wizz_tpu.correlation.blocked import (
        count_pairs_blocked, measurement_tile_cache,
    )
    from yet_another_wizz_tpu.correlation.measurements import PatchLinkage

    reference, unknown, _ = catalogs
    binning = config.binning.binning
    links = PatchLinkage.from_catalogs(config, reference, unknown)
    kwargs = dict(
        auto=False, binned2=False, max_resident_patches=4, backend="xla"
    )
    with measurement_tile_cache(resident_tile_bytes=1 << 30) as cache:
        first = count_pairs_blocked(
            links.edges, links.linkage, reference, unknown, binning,
            **kwargs,
        )
        misses_first = cache.misses
        assert misses_first > 0  # the direct call filled the AMBIENT cache
        second = count_pairs_blocked(
            links.edges, links.linkage, reference, unknown, binning,
            **kwargs,
        )
        assert cache.misses == misses_first  # served from the ambient cache
        assert cache.hits > 0
    np.testing.assert_allclose(second, first, rtol=1e-12)


def test_concurrent_counts_protect_each_other(catalogs, config):
    """An ambient cache shared by CONCURRENT counts (user threads) must
    not let one thread's new count flush another thread's in-flight
    blocks: the eviction floor is the oldest still-running count."""
    from yet_another_wizz_tpu.correlation.blocked import (
        _ColumnTileCache, _build_block_tiles,
    )

    reference, _, _ = catalogs
    binning = config.binning.binning
    tiles = _build_block_tiles(reference, binning, "n", 0, 4, 64)
    nbytes = _ColumnTileCache._device_nbytes(tiles)

    cache = _ColumnTileCache(None, 0, resident_bytes=nbytes + nbytes // 2)
    token_a = cache.begin_count()
    cache.store("a", tiles)
    # a second count begins WHILE the first still runs: "a" must stay
    # protected even under budget pressure from the new count's stores
    # (inspect the layers directly: load() would re-stamp "a" with the
    # newest generation and mask what is being tested)
    token_b = cache.begin_count()
    cache.store("b", tiles)
    assert "a" in cache._resident  # protected: count A still running
    assert "b" not in cache._resident  # no room, "a" not evictable
    cache.end_count(token_a)
    # with count A retired its entry becomes evictable
    cache.store("c", tiles)
    assert "c" in cache._resident
    assert "a" not in cache._resident
    cache.end_count(token_b)


def test_oversized_block_does_not_flush_cache(catalogs, config):
    """A block that cannot fit the budget even after evicting every
    stale entry must not evict anything: flushing blocks that later
    sweeps would reuse buys nothing."""
    from yet_another_wizz_tpu.correlation.blocked import (
        _ColumnTileCache, _build_block_tiles,
    )

    reference, _, _ = catalogs
    binning = config.binning.binning
    small = _build_block_tiles(reference, binning, "n", 0, 2, 64)
    big = _build_block_tiles(reference, binning, "n", 0, 12, 64)
    nbytes = _ColumnTileCache._device_nbytes(small)
    big_nbytes = _ColumnTileCache._device_nbytes(big)
    budget = nbytes + (big_nbytes - nbytes) // 2  # fits small, never big
    assert nbytes <= budget < big_nbytes

    cache = _ColumnTileCache(None, 0, resident_bytes=budget)
    token = cache.begin_count()
    cache.store("a", small)
    cache.end_count(token)
    token = cache.begin_count()
    # even flushing the stale entry cannot make room for "big": the
    # store is refused WITHOUT evicting it, and it keeps serving
    cache.store("big", big)
    assert cache.load("big", count=False) is None
    assert cache.load("a", count=False) is small
    cache.end_count(token)


def test_disk_hit_promotes_to_resident(catalogs, config):
    """A block that spilled to disk while the resident budget was full
    is promoted on its next load once the budget has room — it must not
    pay deserialize + re-upload on every revisit for the rest of a
    session while resident bytes sit idle."""
    import tempfile

    from yet_another_wizz_tpu.correlation.blocked import (
        _ColumnTileCache, _build_block_tiles,
    )

    reference, _, _ = catalogs
    binning = config.binning.binning
    tiles = _build_block_tiles(reference, binning, "n", 0, 4, 64)
    nbytes = _ColumnTileCache._device_nbytes(tiles)

    with tempfile.TemporaryDirectory() as tmp:
        cache = _ColumnTileCache(
            tmp, 1 << 30, resident_bytes=nbytes + nbytes // 2
        )
        token = cache.begin_count()
        cache.store("a", tiles)
        cache.store("b", tiles)  # no resident room: spills to disk
        assert "b" in cache._paths and "b" not in cache._resident
        cache.end_count(token)

        token = cache.begin_count()
        loaded = cache.load("b")  # resident budget: "a" is stale now
        assert loaded is not None
        # promoted: resident serves the NEXT load, the spill is gone
        assert "b" in cache._resident and "b" not in cache._paths
        assert cache.load("b", count=False) is loaded
        assert cache._used == 0
        cache.end_count(token)


def test_spill_write_failure_degrades_to_uncached(
    catalogs, config, monkeypatch, caplog
):
    """A failed spill write (ENOSPC) warns and disables the disk layer
    instead of aborting the measurement."""
    import logging
    import tempfile

    from yet_another_wizz_tpu.correlation import blocked as blocked_mod
    from yet_another_wizz_tpu.correlation.blocked import (
        _ColumnTileCache, _build_block_tiles,
    )

    reference, _, _ = catalogs
    binning = config.binning.binning
    tiles = _build_block_tiles(reference, binning, "n", 0, 4, 64)

    def broken_savez(path, **payload):
        raise OSError(28, "No space left on device", str(path))

    monkeypatch.setattr(blocked_mod.np, "savez", broken_savez)
    with tempfile.TemporaryDirectory() as tmp:
        cache = _ColumnTileCache(tmp, 1 << 30, resident_bytes=0)
        with caplog.at_level(
            logging.WARNING, logger="yet_another_wizz_tpu"
        ):
            cache.store("a", tiles)  # must not raise
        assert any(
            "disabling tile spill cache" in rec.message
            for rec in caplog.records
        )
        assert cache.load("a", count=False) is None
        cache.store("b", tiles)  # disk layer disabled: quietly skipped
        assert cache.load("b", count=False) is None


def test_gen_stamps_do_not_leak(catalogs, config):
    """Generation stamps of evicted/purged entries are swept: a
    session-long cache must not accumulate dead key tuples."""
    from yet_another_wizz_tpu.correlation.blocked import (
        _ColumnTileCache, _build_block_tiles,
    )

    reference, _, _ = catalogs
    binning = config.binning.binning
    tiles = _build_block_tiles(reference, binning, "n", 0, 4, 64)
    nbytes = _ColumnTileCache._device_nbytes(tiles)

    cache = _ColumnTileCache(None, 0, resident_bytes=nbytes)
    for name in "abcdefgh":
        token = cache.begin_count()
        cache.store(name, tiles)
        cache.end_count(token)
    cache.begin_count()  # runs the purge sweep
    assert set(cache._gen) <= set(cache._resident) | set(cache._paths)
    assert len(cache._gen) <= 1


def test_cache_purges_entries_of_freed_catalogs(config):
    """A session cache must not accumulate blocks of catalogs the caller
    has dropped: once the budget is under pressure, dead-keyed entries
    (resident AND disk-spilled) are reclaimed, bytes and files included."""
    import gc
    import os

    from yet_another_wizz_tpu.correlation.blocked import (
        count_pairs_blocked, measurement_tile_cache,
    )
    from yet_another_wizz_tpu.correlation.measurements import PatchLinkage

    def make_catalogs(seed):
        mock = generate_mock_data(
            num_reference=2000, num_unknown=3000, num_randoms=1, seed=seed
        )
        reference = Catalog.from_arrays(
            **mock["reference"], degrees=False, patch_num=8
        )
        unknown = Catalog.from_arrays(
            **mock["unknown"], degrees=False,
            patch_centers=reference.get_centers(),
        )
        return reference, unknown

    binning = config.binning.binning
    with measurement_tile_cache(
        tile_cache_bytes=1 << 20, resident_tile_bytes=1 << 20
    ) as cache:
        for seed in (31, 32, 33):
            reference, unknown = make_catalogs(seed)
            links = PatchLinkage.from_catalogs(config, reference, unknown)
            count_pairs_blocked(
                links.edges, links.linkage, reference, unknown, binning,
                auto=False, binned2=False, max_resident_patches=4,
                backend="xla", cache=cache,
            )
            del reference, unknown, links
            gc.collect()
        # all keyed catalogs are dead; the purge reclaims everything
        cache.purge_dead()
        assert not cache._resident and cache._resident_used == 0
        assert not cache._paths and cache._used == 0
        if cache._dir is not None:
            assert not any(os.scandir(cache._dir))


def test_resident_tile_cache(catalogs, config):
    """The resident layer keeps the TileSet objects (and therefore their
    cached device arrays) alive across revisits; blocks beyond the
    resident budget spill to disk; results are identical either way."""
    import tempfile

    from yet_another_wizz_tpu.correlation.blocked import (
        _ColumnTileCache, _build_block_tiles, count_pairs_blocked,
    )
    from yet_another_wizz_tpu.correlation.measurements import PatchLinkage

    reference, unknown, randoms = catalogs
    binning = config.binning.binning
    tiles = _build_block_tiles(reference, binning, "n", 0, 4, 64)

    with tempfile.TemporaryDirectory() as tmp:
        # generous resident budget: served from memory, nothing on disk
        cache = _ColumnTileCache(tmp, 1 << 30, resident_bytes=1 << 30)
        cache.store(0, tiles)
        assert cache.load(0) is tiles  # the SAME object -> device cache too
        assert cache._paths == {}

        # budget too small for even one block: falls through to disk
        spilled = _ColumnTileCache(tmp, 1 << 30, resident_bytes=1)
        spilled.store(0, tiles)
        assert 0 in spilled._paths
        assert spilled.load(0) is not tiles

        # resident-only cache (no spill directory)
        no_disk = _ColumnTileCache(None, 0, resident_bytes=1 << 30)
        no_disk.store(0, tiles)
        assert no_disk.load(0) is tiles

    # resident-only run equals the fully uncached run
    links = PatchLinkage.from_catalogs(config, reference, unknown)
    kwargs = dict(
        auto=False, binned2=False, max_resident_patches=4, backend="xla"
    )
    resident = count_pairs_blocked(
        links.edges, links.linkage, reference, unknown, binning,
        tile_cache_bytes=0, resident_tile_bytes=1 << 30, **kwargs,
    )
    uncached = count_pairs_blocked(
        links.edges, links.linkage, reference, unknown, binning,
        tile_cache_bytes=0, resident_tile_bytes=0, **kwargs,
    )
    np.testing.assert_allclose(resident, uncached, rtol=1e-6, atol=1e-6)


def test_cache_load_uncounted(catalogs, config):
    """``load(key, count=False)`` serves the twin re-check without moving
    the hit/miss statistics (the counters are asserted on by tests as a
    proxy for packing work, see ``_ColumnTileCache.load``)."""
    import tempfile

    from yet_another_wizz_tpu.correlation.blocked import (
        _ColumnTileCache, _build_block_tiles,
    )

    reference, _, _ = catalogs
    binning = config.binning.binning
    tiles = _build_block_tiles(reference, binning, "n", 0, 4, 64)

    with tempfile.TemporaryDirectory() as tmp:
        cache = _ColumnTileCache(tmp, 1 << 30, resident_bytes=1 << 30)
        assert cache.load(0, count=False) is None  # miss: uncounted
        assert (cache.hits, cache.misses) == (0, 0)
        cache.store(0, tiles)
        assert cache.load(0, count=False) is tiles  # resident: uncounted
        assert (cache.hits, cache.misses) == (0, 0)

        spilled = _ColumnTileCache(tmp, 1 << 30, resident_bytes=1)
        spilled.store(1, tiles)
        assert spilled.load(1, count=False) is not None  # disk: uncounted
        assert (spilled.hits, spilled.misses) == (0, 0)
        # the counted path still counts
        assert spilled.load(1) is not None
        assert (spilled.hits, spilled.misses) == (1, 0)


def test_cache_load_resident_only(catalogs, config):
    """``resident_only=True`` never deserializes a disk-spilled block —
    the twin re-check must not trade an already-built tile set for an
    npz read plus a fresh upload."""
    import tempfile

    from yet_another_wizz_tpu.correlation.blocked import (
        _ColumnTileCache, _build_block_tiles,
    )

    reference, _, _ = catalogs
    binning = config.binning.binning
    tiles = _build_block_tiles(reference, binning, "n", 0, 4, 64)

    with tempfile.TemporaryDirectory() as tmp:
        resident = _ColumnTileCache(tmp, 1 << 30, resident_bytes=1 << 30)
        resident.store(0, tiles)
        assert resident.load(0, count=False, resident_only=True) is tiles

        spilled = _ColumnTileCache(tmp, 1 << 30, resident_bytes=1)
        spilled.store(0, tiles)
        assert spilled.load(0, count=False, resident_only=True) is None
        assert spilled.load(0, count=False) is not None  # disk layer


def test_malformed_resident_bytes_env(monkeypatch):
    """A malformed YAWT_RESIDENT_TILE_BYTES degrades to the default
    instead of aborting the measurement."""
    from yet_another_wizz_tpu.correlation.blocked import (
        _resolve_resident_bytes,
    )

    monkeypatch.setenv("YAWT_RESIDENT_TILE_BYTES", "4GB")
    assert _resolve_resident_bytes(None) == 4 << 30
    monkeypatch.setenv("YAWT_RESIDENT_TILE_BYTES", "")
    assert _resolve_resident_bytes(None) == 4 << 30
    monkeypatch.setenv("YAWT_RESIDENT_TILE_BYTES", "123")
    assert _resolve_resident_bytes(None) == 123
    assert _resolve_resident_bytes(7) == 7


def test_auto_blocked_shared_cache(catalogs, config):
    """Autocorrelation-shaped counts share ONE cache between the row and
    column sides (their keys coincide): results match the uncached run
    and each block is packed at most twice (once per racing prefetch
    side, the twin re-check then collapses them to one stored object)."""
    from yet_another_wizz_tpu.correlation.blocked import (
        count_pairs_blocked, measurement_tile_cache,
    )
    from yet_another_wizz_tpu.correlation.measurements import PatchLinkage

    reference, _, _ = catalogs
    links = PatchLinkage.from_catalogs(config, reference)
    binning = config.binning.binning
    kwargs = dict(
        auto=True, binned2=True, max_resident_patches=4, backend="xla"
    )
    num_blocks = -(-reference.num_patches // 2)

    with measurement_tile_cache() as cache:
        counted = count_pairs_blocked(
            links.edges, links.linkage, reference, reference, binning,
            cache=cache, **kwargs,
        )
        # one counted miss per block per side at most; revisits must hit
        assert cache.misses <= 2 * num_blocks
        assert cache.hits > 0

    uncached = count_pairs_blocked(
        links.edges, links.linkage, reference, reference, binning,
        tile_cache_bytes=0, resident_tile_bytes=0, **kwargs,
    )
    np.testing.assert_allclose(counted, uncached, rtol=1e-6, atol=1e-6)


def test_measurement_scoped_cache(catalogs, config):
    """A measurement-scoped cache shares column blocks between count
    types (DD and RD both stream the unknown catalog as columns), while
    keys keep genuinely different tile sets apart."""
    from yet_another_wizz_tpu.correlation.blocked import (
        count_pairs_blocked, measurement_tile_cache,
    )
    from yet_another_wizz_tpu.correlation.measurements import PatchLinkage

    reference, unknown, randoms = catalogs
    links = PatchLinkage.from_catalogs(config, reference, unknown, randoms)
    binning = config.binning.binning
    kwargs = dict(
        auto=False, binned2=False, max_resident_patches=4, backend="xla"
    )
    num_blocks = -(-reference.num_patches // 2)  # block = 4 // 2

    with measurement_tile_cache() as cache:
        dd = count_pairs_blocked(
            links.edges, links.linkage, reference, unknown, binning,
            cache=cache, **kwargs,
        )
        misses_after_dd = cache.misses
        # DD packed ref rows + unknown columns, one miss per block each
        assert misses_after_dd == 2 * num_blocks
        rd = count_pairs_blocked(
            links.edges, links.linkage, randoms, unknown, binning,
            cache=cache, **kwargs,
        )
        # RD only packs its own (randoms) row blocks; every column load
        # hits the blocks the DD pass stored
        assert cache.misses - misses_after_dd == num_blocks

    np.testing.assert_allclose(
        dd,
        count_pairs_blocked(
            links.edges, links.linkage, reference, unknown, binning,
            tile_cache_bytes=0, resident_tile_bytes=0, **kwargs,
        ),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        rd,
        count_pairs_blocked(
            links.edges, links.linkage, randoms, unknown, binning,
            tile_cache_bytes=0, resident_tile_bytes=0, **kwargs,
        ),
        rtol=1e-6, atol=1e-6,
    )


def test_tomographic_bins_share_reference_sides(catalogs, config):
    """The tomographic production pattern: every bin's cross-correlation
    reuses the SAME reference sample and randoms with a different
    unknown slice. Under one session cache bin 2 must rebuild ONLY its
    own unknown blocks — the shared row sides (reference for DD,
    randoms for RD) are served from cache, so the per-bin marginal cost
    is the unknown slice alone (round-4 verdict, ask #6)."""
    from yet_another_wizz_tpu.correlation import blocked as blocked_mod
    from yet_another_wizz_tpu.correlation.blocked import (
        measurement_tile_cache,
    )

    reference, _, randoms = catalogs
    mock = generate_mock_data(
        num_reference=10, num_unknown=6000, num_randoms=10, seed=21
    )["unknown"]
    rng = np.random.default_rng(5)
    slice_mask = rng.random(len(mock["ra"])) < 0.5

    def unknown_slice(mask):
        return Catalog.from_arrays(
            **{key: value[mask] for key, value in mock.items()},
            degrees=False,
            patch_centers=reference.get_centers(),
        )

    bin1 = unknown_slice(slice_mask)
    bin2 = unknown_slice(~slice_mask)

    builds = {"n": 0}
    original = blocked_mod._build_block_tiles

    def counting(catalog, *args, **kwargs):
        builds["n"] += 1
        builds.setdefault("catalogs", []).append(catalog)
        return original(catalog, *args, **kwargs)

    kwargs = dict(backend="xla", max_resident_patches=4)
    with measurement_tile_cache(resident_tile_bytes=1 << 30):
        crosscorrelate(config, reference, bin1, ref_rand=randoms, **kwargs)
        import unittest.mock

        with unittest.mock.patch.object(
            blocked_mod, "_build_block_tiles", counting
        ):
            (second,) = crosscorrelate(
                config, reference, bin2, ref_rand=randoms, **kwargs
            )
    # bin 2 packed blocks ONLY for its own unknown slice; the shared
    # reference and randoms row sides all hit the session cache
    assert builds["n"] > 0
    assert all(cat is bin2 for cat in builds["catalogs"])
    assert np.isfinite(second.sample().data).all()
