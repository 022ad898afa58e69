"""Native C++ tile-packing kernels against their numpy fallbacks."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu import _native
from yet_another_wizz_tpu.ops import tiles as tiles_mod

pytestmark = pytest.mark.skipif(
    not _native.NATIVE_ENABLED, reason="native library unavailable"
)


@pytest.fixture
def points(rng):
    n = 5000
    xyz = rng.normal(size=(n, 3))
    xyz /= np.linalg.norm(xyz, axis=1, keepdims=True)
    return xyz


class TestNativeKernels:
    def test_morton_matches_numpy(self, points):
        native = _native.morton_codes(points, 10)
        quantised = np.clip(
            ((points + 1.0) * 512).astype(np.int64), 0, 1023
        )
        codes = np.zeros(len(points), dtype=np.int64)
        for bit in range(10):
            for dim in range(3):
                codes |= ((quantised[:, dim] >> bit) & 1) << (3 * bit + dim)
        assert np.array_equal(native, codes)

    def test_pack_matches_numpy(self, points, rng):
        n = len(points)
        weights = rng.uniform(0.5, 2, n)
        zbins = rng.integers(0, 5, n).astype(np.float64)
        tile_size = 64
        num_tiles = -(-n // tile_size) + 2
        dest = rng.permutation(num_tiles * tile_size)[:n].astype(np.int64)

        native = _native.pack_tiles(
            points, weights, zbins, dest, num_tiles, tile_size
        )
        fallback = tiles_mod._pack_numpy(
            points, weights, zbins, dest, num_tiles, tile_size
        )
        assert np.array_equal(native, fallback)

    def test_caps_match_numpy(self, points, rng):
        n = len(points)
        tile_size = 64
        num_tiles = -(-n // tile_size)
        dest = np.arange(n, dtype=np.int64)

        nc, nr = _native.tile_caps(points, dest, num_tiles, tile_size)
        fc, fr = tiles_mod._caps_numpy(points, dest, num_tiles, tile_size)
        assert_allclose(nc, fc, rtol=1e-12)
        assert_allclose(nr, fr, rtol=1e-12)

    def test_encode_fixedpoint_matches_numpy(self, points, rng, monkeypatch):
        n = len(points)
        ts = tiles_mod.build_tile_set(
            points, rng.integers(0, 6, n), 6,
            weights=rng.uniform(0.5, 2, n),
            zbins=rng.integers(0, 4, n), num_bins=4, tile_size=64,
        )
        native_packed, native_params, native_zbins = (
            tiles_mod.encode_fixedpoint_lanes(ts.lane_data, ts.tile_center)
        )
        monkeypatch.setattr(_native, "NATIVE_ENABLED", False)
        fallback_packed, fallback_params, fallback_zbins = (
            tiles_mod.encode_fixedpoint_lanes(ts.lane_data, ts.tile_center)
        )
        assert np.array_equal(native_packed, fallback_packed)
        assert np.array_equal(native_params, fallback_params)
        assert native_zbins.dtype == fallback_zbins.dtype == np.int8
        assert np.array_equal(native_zbins, fallback_zbins)

    def test_sort_order_matches_lexsort(self, rng):
        """The composite-key radix argsort must reproduce np.lexsort's
        stable (patch, zbin, morton) order exactly, including ties (both
        layouts; duplicates force the stability to matter)."""
        for n in (0, 1, 7, 100_000):
            patches = rng.integers(0, 97, n).astype(np.int32)
            zbins = rng.integers(0, 300, n).astype(np.int32)
            morton = rng.integers(0, 2**30, n).astype(np.int64)
            expect = np.lexsort((morton, zbins, patches))
            got = _native.sort_order(patches, zbins, morton)
            assert np.array_equal(got, expect)
            expect_spatial = np.lexsort((morton, patches))
            got_spatial = _native.sort_order(patches, None, morton)
            assert np.array_equal(got_spatial, expect_spatial)

    def test_gathers_match_fancy_indexing(self, rng):
        n = 50_000
        order = rng.permutation(n).astype(np.int64)
        vec = rng.normal(size=(n, 3))
        flat = rng.normal(size=n)
        ints = rng.integers(-5, 5, n).astype(np.int32)
        assert np.array_equal(_native.gather_f64(vec, order), vec[order])
        assert np.array_equal(_native.gather_f64(flat, order), flat[order])
        assert np.array_equal(_native.gather_i32(ints, order), ints[order])
        assert np.array_equal(
            _native.gather_i32_to_f64(ints, order),
            ints[order].astype(np.float64),
        )

    def test_strided_radec_equals_contiguous(self, rng):
        """Structured-array columns (strided views) convert without a
        copy and bit-match the contiguous entry point."""
        n = 40_000
        records = np.zeros(
            n, dtype=[("ra", "f8"), ("dec", "f8"), ("w", "f8")]
        )
        records["ra"] = rng.uniform(0, 2 * np.pi, n)
        records["dec"] = rng.uniform(-1.5, 1.5, n)
        strided = _native.radec_to_xyz(records["ra"], records["dec"])
        contiguous = _native.radec_to_xyz(
            records["ra"].copy(), records["dec"].copy()
        )
        assert np.array_equal(strided, contiguous)
        # reversed (negative-stride) views too
        rev = _native.radec_to_xyz(records["ra"][::-1], records["dec"][::-1])
        assert np.array_equal(rev, contiguous[::-1])

    def test_fused_assign_equals_unfused(self, rng):
        n = 40_000
        records = np.zeros(n, dtype=[("ra", "f8"), ("dec", "f8")])
        records["ra"] = rng.uniform(0, 2 * np.pi, n)
        records["dec"] = rng.uniform(-1.5, 1.5, n)
        centers = rng.normal(size=(17, 3))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        fused = _native.assign_patches_radec(
            records["ra"], records["dec"], centers
        )
        xyz = _native.radec_to_xyz(records["ra"], records["dec"])
        assert np.array_equal(fused, _native.assign_patches(xyz, centers))

    def test_counting_argsort_matches_stable_argsort(self, rng):
        for num_ids, n in ((7, 100_000), (301, 50_000), (5, 0), (3, 1)):
            ids = rng.integers(0, num_ids, n).astype(np.int16)
            order, counts = _native.counting_argsort_ids(ids, num_ids)
            assert np.array_equal(order, np.argsort(ids, kind="stable"))
            assert np.array_equal(counts, np.bincount(ids, minlength=num_ids))

    def test_gather_rows_matches_fancy_indexing(self, rng):
        n = 30_000
        records = np.zeros(
            n, dtype=[("ra", "f8"), ("dec", "f8"), ("z", "f8"), ("w", "f8")]
        )
        for name in records.dtype.names:
            records[name] = rng.normal(size=n)
        order = rng.permutation(n).astype(np.int64)
        assert np.array_equal(_native.gather_rows(records, order),
                              records[order])

    def test_tileset_native_equals_fallback(self, points, rng, monkeypatch):
        n = len(points)
        weights = rng.uniform(0.5, 2, n)
        zbins = rng.integers(0, 4, n)
        patches = rng.integers(0, 6, n)

        native_ts = tiles_mod.build_tile_set(
            points, patches, 6, weights=weights, zbins=zbins, num_bins=4,
            tile_size=64,
        )
        monkeypatch.setattr(_native, "NATIVE_ENABLED", False)
        fallback_ts = tiles_mod.build_tile_set(
            points, patches, 6, weights=weights, zbins=zbins, num_bins=4,
            tile_size=64,
        )
        assert np.array_equal(native_ts.lane_data, fallback_ts.lane_data)
        assert_allclose(native_ts.tile_center, fallback_ts.tile_center)
        assert_allclose(native_ts.tile_radius, fallback_ts.tile_radius)
        assert_allclose(native_ts.sum_weights, fallback_ts.sum_weights)
