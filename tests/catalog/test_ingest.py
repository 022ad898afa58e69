"""Streaming (bounded-memory) catalog ingestion."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu import Catalog


@pytest.fixture
def parquet_file(rng, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 5000
    table = pa.table(
        dict(
            ra=rng.uniform(10, 30, n),
            dec=rng.uniform(-10, 10, n),
            z=rng.uniform(0.1, 1.0, n),
            w=rng.uniform(0.5, 2.0, n),
        )
    )
    path = tmp_path / "cat.pqt"
    pq.write_table(table, path, row_group_size=512)
    return path, table


NAMES = dict(ra_name="ra", dec_name="dec", redshift_name="z", weight_name="w")


class TestStreamingIngestion:
    def test_matches_in_memory_path(self, parquet_file, tmp_path):
        path, table = parquet_file
        in_memory = Catalog.from_file(
            None, path, **NAMES, patch_num=4, streaming=False
        )
        streamed = Catalog.from_file(
            tmp_path / "cache", path, **NAMES,
            patch_centers=in_memory.get_centers(),
            streaming=True, chunksize=700,
        )
        assert streamed.num_patches == in_memory.num_patches
        # same total records and weights per patch (modulo patch mode)
        assert sum(streamed.get_num_records()) == len(table)
        assert_allclose(
            sorted(streamed.redshifts), sorted(in_memory.redshifts),
            rtol=1e-12,
        )

    def test_negative_patch_ids_rejected(self, rng, tmp_path):
        """A file using -1 as an 'unassigned' patch sentinel must be
        rejected with a clear error instead of silently writing a
        patch_-1 cache directory (the caches and count tensors require
        contiguous ids 0..P-1)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        n = 1000
        patches = rng.integers(0, 3, n)
        patches[::7] = -1  # sentinel rows
        table = pa.table(
            dict(
                ra=rng.uniform(10, 30, n),
                dec=rng.uniform(-10, 10, n),
                patch=patches,
            )
        )
        path = tmp_path / "sentinel.pqt"
        pq.write_table(table, path)
        with pytest.raises(ValueError, match="non-negative"):
            Catalog.from_file(
                tmp_path / "cache", path, ra_name="ra", dec_name="dec",
                patch_name="patch", streaming=True,
            )

    def test_streaming_rejects_malformed_centers(self, parquet_file, tmp_path):
        """Same validation as the in-memory path: a (3,) center array is
        rejected instead of mis-striding the assignment kernel."""
        path, _ = parquet_file
        with pytest.raises(ValueError, match="patch_centers"):
            Catalog.from_file(
                tmp_path / "cache", path, **NAMES,
                patch_centers=np.array([0.5, 0.5, 0.7]), streaming=True,
            )

    def test_same_patch_assignment(self, parquet_file, tmp_path):
        path, _ = parquet_file
        reference = Catalog.from_file(
            None, path, **NAMES, patch_num=5, streaming=False
        )
        streamed = Catalog.from_file(
            tmp_path / "cache", path, **NAMES,
            patch_centers=reference.get_centers(),
            streaming=True, chunksize=999,
        )
        assert streamed.get_num_records() == reference.get_num_records()
        assert_allclose(
            streamed.get_sum_weights(), reference.get_sum_weights(),
            rtol=1e-12,
        )

    def test_streaming_without_cache(self, parquet_file, tmp_path):
        """Tile-ready catalogs build directly from the streaming reader;
        no patch-cache round trip required (single-process)."""
        path, _ = parquet_file
        centers = Catalog.from_file(
            None, path, **NAMES, patch_num=4, streaming=False
        ).get_centers()
        cached = Catalog.from_file(
            tmp_path / "cache", path, **NAMES, patch_centers=centers,
            streaming=True, chunksize=700,
        )
        cache_free = Catalog.from_file(
            None, path, **NAMES, patch_centers=centers,
            streaming=True, chunksize=700,
        )
        assert cache_free.cache_directory is None
        assert cache_free.get_num_records() == cached.get_num_records()
        np.testing.assert_array_equal(
            cache_free._chunk, cached._chunk
        )
        np.testing.assert_array_equal(
            cache_free._patch_ids, cached._patch_ids
        )

    def test_direct_construction_identical_to_cache_readback(
        self, parquet_file, tmp_path
    ):
        """The root process constructs the catalog from the streamed data
        in memory; a process attaching to the written cache must see byte
        identical rows (cross-process determinism of the counts)."""
        path, _ = parquet_file
        streamed = Catalog.from_file(
            tmp_path / "cache", path, **NAMES, patch_num=4,
            streaming=True, chunksize=700, probe_size=2000,
        )
        readback = Catalog(tmp_path / "cache")
        np.testing.assert_array_equal(streamed._chunk, readback._chunk)
        np.testing.assert_array_equal(
            streamed._patch_ids, readback._patch_ids
        )
        # centers round-trip through meta.yml via xyz->radec->yaml->radec
        # ->xyz, which costs a few ulps in the trig conversions (measured
        # worst case ~3e-15); rows and tiles stay byte identical
        assert_allclose(
            streamed.patch_centers_xyz, readback.patch_centers_xyz,
            rtol=0, atol=5e-15,
        )
        from yet_another_wizz_tpu.binning import Binning

        binning = Binning(np.linspace(0.1, 1.0, 5))
        tiles_a = streamed.get_tiles(binning)
        tiles_b = readback.get_tiles(binning)
        np.testing.assert_array_equal(tiles_a.lane_data, tiles_b.lane_data)
        np.testing.assert_array_equal(
            tiles_a.sum_weights, tiles_b.sum_weights
        )

    def test_kmeans_probe_centers(self, parquet_file, tmp_path):
        path, _ = parquet_file
        streamed = Catalog.from_file(
            tmp_path / "cache", path, **NAMES, patch_num=4,
            streaming=True, chunksize=1000, probe_size=2000,
        )
        assert streamed.num_patches == 4
        assert min(streamed.get_num_records()) > 0

    def test_auto_streaming_threshold(self, parquet_file, tmp_path):
        path, _ = parquet_file
        # chunksize smaller than the input triggers streaming automatically
        catalog = Catalog.from_file(
            tmp_path / "cache", path, **NAMES, patch_num=4, chunksize=800
        )
        assert (tmp_path / "cache" / "patch_0" / "data.bin").exists()
        assert sum(catalog.get_num_records()) == 5000

    def test_catalog_as_patch_centers(self, parquet_file, tmp_path):
        """Streaming accepts a Catalog for patch_centers like the
        in-memory path (regression: it used to crash in
        resolve_patch_centers for inputs large enough to stream)."""
        path, _ = parquet_file
        other = Catalog.from_file(
            None, path, **NAMES, patch_num=4, streaming=False
        )
        streamed = Catalog.from_file(
            tmp_path / "cache", path, **NAMES, patch_centers=other,
            streaming=True, chunksize=700,
        )
        assert streamed.get_num_records() == other.get_num_records()


class TestNativeIngestHelpers:
    """The fused native assignment/split paths against their fallbacks
    (the fallbacks also serve compilers-less hosts, so both sides must
    produce identical caches)."""

    def _chunk(self, rng, n=4000):
        records = np.zeros(
            n, dtype=[("ra", "f8"), ("dec", "f8"), ("weights", "f8")]
        )
        records["ra"] = rng.uniform(0.1, 0.6, n)
        records["dec"] = rng.uniform(-0.2, 0.2, n)
        records["weights"] = rng.uniform(0.5, 2.0, n)
        return records

    def test_assign_from_radec_matches_fallback(self, rng, monkeypatch):
        from yet_another_wizz_tpu import _native
        from yet_another_wizz_tpu.catalog.ingest import _assign_from_radec
        from yet_another_wizz_tpu.coordinates import radec_to_xyz
        from yet_another_wizz_tpu.ops.kmeans import assign_patches

        if not _native.NATIVE_ENABLED:
            pytest.skip("native library unavailable")
        chunk = self._chunk(rng)
        centers = radec_to_xyz(
            np.array([0.2, 0.3, 0.5]), np.array([-0.1, 0.0, 0.1])
        )
        fused = _assign_from_radec(chunk["ra"], chunk["dec"], centers)
        monkeypatch.setattr(_native, "NATIVE_ENABLED", False)
        fallback = _assign_from_radec(chunk["ra"], chunk["dec"], centers)
        assert np.array_equal(fused, fallback)
        assert np.array_equal(
            fallback, assign_patches(radec_to_xyz(chunk["ra"], chunk["dec"]),
                                     centers)
        )

    def test_split_by_patch_matches_fallback(self, rng, monkeypatch):
        from yet_another_wizz_tpu import _native
        from yet_another_wizz_tpu.catalog.ingest import _split_by_patch

        if not _native.NATIVE_ENABLED:
            pytest.skip("native library unavailable")
        chunk = self._chunk(rng)
        ids = rng.integers(0, 7, len(chunk)).astype(np.int16)
        # id 3 intentionally absent: split must skip empty patches
        ids[ids == 3] = 4
        native_splits, native_sorted = _split_by_patch(chunk, ids)
        monkeypatch.setattr(_native, "NATIVE_ENABLED", False)
        numpy_splits, numpy_sorted = _split_by_patch(chunk, ids)
        assert np.array_equal(native_sorted, numpy_sorted)
        assert [pid for pid, _ in native_splits] == [
            pid for pid, _ in numpy_splits
        ]
        for (_, a), (_, b) in zip(native_splits, numpy_splits):
            assert np.array_equal(a, b)
