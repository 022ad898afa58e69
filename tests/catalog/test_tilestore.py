"""Persistent packed-tile store: disk-cached catalogs stream packed
blocks from ``<cache>/tiles/`` instead of repacking per measurement."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu import Catalog, Configuration
from yet_another_wizz_tpu.catalog.tilestore import (
    MAX_FINGERPRINTS,
    PackedTileStore,
    tileset_from_payload,
    tileset_payload,
)
from yet_another_wizz_tpu.correlation import blocked
from yet_another_wizz_tpu.correlation.measurements import crosscorrelate
from yet_another_wizz_tpu.examples import generate_mock_data


@pytest.fixture()
def cached_catalogs(tmp_path):
    mock = generate_mock_data(
        num_reference=2500, num_unknown=4000, num_randoms=6000, seed=33
    )
    reference = Catalog.from_arrays(
        **mock["reference"], degrees=False, patch_num=8,
        cache_directory=tmp_path / "ref",
    )
    centers = reference.get_centers()
    unknown = Catalog.from_arrays(
        **mock["unknown"], degrees=False, patch_centers=centers,
        cache_directory=tmp_path / "unk",
    )
    randoms = Catalog.from_arrays(
        **mock["randoms"], degrees=False, patch_centers=centers,
        cache_directory=tmp_path / "rand",
    )
    return reference, unknown, randoms


@pytest.fixture()
def config():
    return Configuration.create(
        rmin=500, rmax=3000, unit="kpc", zmin=0.15, zmax=1.0, num_bins=4
    )


@pytest.fixture()
def build_counter(monkeypatch):
    """Count _build_block_tiles invocations (i.e. actual repacking)."""
    calls = {"n": 0}
    original = blocked._build_block_tiles

    def counting(*args, **kwargs):
        calls["n"] += 1
        return original(*args, **kwargs)

    monkeypatch.setattr(blocked, "_build_block_tiles", counting)
    return calls


def test_blocked_measurements_reuse_packed_tiles(
    cached_catalogs, config, build_counter
):
    """The second measurement over disk-cached catalogs packs NOTHING:
    every block comes from the persistent store, and the counts match
    the in-memory engine exactly as before."""
    reference, unknown, randoms = cached_catalogs
    (full,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla"
    )
    (first,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    assert build_counter["n"] > 0
    for catalog in cached_catalogs:
        assert any((catalog.cache_directory / "tiles").rglob("block_*.npz"))

    build_counter["n"] = 0
    (second,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    assert build_counter["n"] == 0  # streamed from the store
    assert_allclose(
        second.dd.counts.counts, full.dd.counts.counts, rtol=1e-6, atol=1e-3
    )
    assert_allclose(
        second.rd.counts.counts, full.rd.counts.counts, rtol=1e-6, atol=1e-3
    )
    assert_allclose(
        second.dd.counts.counts, first.dd.counts.counts, rtol=1e-12
    )


def test_changed_binning_invalidates(cached_catalogs, config, build_counter):
    """A different binning hashes to a fresh fingerprint: blocks are
    repacked, never served stale."""
    reference, unknown, randoms = cached_catalogs
    crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    build_counter["n"] = 0
    other = Configuration.create(
        rmin=500, rmax=3000, unit="kpc", zmin=0.2, zmax=0.9, num_bins=3
    )
    crosscorrelate(
        other, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    assert build_counter["n"] > 0


def test_changed_block_size_invalidates(
    cached_catalogs, config, build_counter
):
    reference, unknown, randoms = cached_catalogs
    crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    build_counter["n"] = 0
    crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=8,
    )
    assert build_counter["n"] > 0


def test_store_disabled_by_env(
    cached_catalogs, config, build_counter, monkeypatch
):
    monkeypatch.setenv("YAWT_TILE_STORE", "0")
    reference, unknown, randoms = cached_catalogs
    crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    for catalog in cached_catalogs:
        assert not (catalog.cache_directory / "tiles").exists()
    build_counter["n"] = 0
    crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    assert build_counter["n"] > 0  # nothing persisted


def test_in_memory_catalogs_have_no_store(config, build_counter):
    """from_arrays without a cache directory: nothing to attach a store
    to, measurements repack (the session caches cover repetition)."""
    mock = generate_mock_data(
        num_reference=1500, num_unknown=2000, num_randoms=2000, seed=7
    )
    reference = Catalog.from_arrays(
        **mock["reference"], degrees=False, patch_num=6
    )
    centers = reference.get_centers()
    unknown = Catalog.from_arrays(
        **mock["unknown"], degrees=False, patch_centers=centers
    )
    randoms = Catalog.from_arrays(
        **mock["randoms"], degrees=False, patch_centers=centers
    )
    assert PackedTileStore.open(
        reference, None, "n", "spatial", 3, 512
    ) is None
    crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    assert build_counter["n"] > 0
    build_counter["n"] = 0
    crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    assert build_counter["n"] > 0


def test_unreadable_block_degrades_to_miss(
    cached_catalogs, config, build_counter
):
    reference, unknown, randoms = cached_catalogs
    (first,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    # corrupt every stored block of one catalog
    corrupted = 0
    for path in (unknown.cache_directory / "tiles").rglob("block_*.npz"):
        path.write_bytes(b"not an npz")
        corrupted += 1
    assert corrupted > 0
    build_counter["n"] = 0
    (second,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend="xla",
        max_resident_patches=4,
    )
    assert build_counter["n"] > 0  # repacked the corrupted side
    assert_allclose(
        second.dd.counts.counts, first.dd.counts.counts, rtol=1e-12
    )


def test_payload_round_trip(cached_catalogs, config):
    reference, _, _ = cached_catalogs
    tiles = reference.get_tiles(config.binning.binning)
    rebuilt = tileset_from_payload(
        {
            key: np.asarray(value)
            for key, value in tileset_payload(tiles).items()
        }
    )
    for name in (
        "lane_data", "tile_patch", "tile_center", "tile_radius",
        "patch_tile_start", "patch_tile_stop", "sum_weights",
        "tile_zmin", "tile_zmax",
    ):
        np.testing.assert_array_equal(
            getattr(rebuilt, name), getattr(tiles, name), err_msg=name
        )
    assert rebuilt.num_bins == tiles.num_bins
    assert rebuilt.num_points == tiles.num_points
    assert rebuilt.tile_size == tiles.tile_size
    assert rebuilt.device_pad_base == tiles.device_pad_base
    assert rebuilt.sum_kappa is None and tiles.sum_kappa is None


def test_stale_fingerprints_pruned(cached_catalogs, config):
    """Saving under a new fingerprint prunes the oldest directories
    beyond the retention count."""
    import os
    import time

    reference, _, _ = cached_catalogs
    tiles = reference.get_tiles(config.binning.binning)
    root = reference.cache_directory / "tiles"
    for i in range(MAX_FINGERPRINTS + 2):
        store = PackedTileStore(root, f"fp{i:02d}")
        store.save(0, tiles)
        # distinct mtimes so the pruning order is deterministic
        t = time.time() - 100 + i
        os.utime(root / f"fp{i:02d}", (t, t))
    store = PackedTileStore(root, "fresh")
    store.save(0, tiles)
    kept = sorted(p.name for p in root.iterdir())
    assert "fresh" in kept
    assert len(kept) <= MAX_FINGERPRINTS + 1
    assert "fp00" not in kept and "fp01" not in kept


def test_save_never_overwrites(cached_catalogs, config, tmp_path):
    reference, _, _ = cached_catalogs
    tiles = reference.get_tiles(config.binning.binning)
    store = PackedTileStore(tmp_path / "tiles", "abc")
    store.save(0, tiles)
    path = tmp_path / "tiles" / "abc" / "block_0.npz"
    before = path.stat().st_mtime_ns
    store.save(0, tiles)
    assert path.stat().st_mtime_ns == before
