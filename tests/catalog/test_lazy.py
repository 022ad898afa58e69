"""Disk-backed LazyCatalog: bounded host memory through the blocked path."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu import Catalog, Configuration, LazyCatalog
from yet_another_wizz_tpu.correlation.measurements import (
    autocorrelate,
    crosscorrelate,
)
from yet_another_wizz_tpu.examples import generate_mock_data


@pytest.fixture(scope="module")
def caches(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lazy")
    mock = generate_mock_data(
        num_reference=4000, num_unknown=6000, num_randoms=8000, seed=31
    )
    reference = Catalog.from_arrays(
        **mock["reference"], degrees=False, patch_num=6,
        cache_directory=tmp / "ref",
    )
    centers = reference.get_centers()
    unknown = Catalog.from_arrays(
        **mock["unknown"], degrees=False, patch_centers=centers,
        cache_directory=tmp / "unk",
    )
    randoms = Catalog.from_arrays(
        **mock["randoms"], degrees=False, patch_centers=centers,
        cache_directory=tmp / "rand",
    )
    return tmp, reference, unknown, randoms


class TestLazyMetadata:
    def test_matches_resident_catalog(self, caches):
        tmp, reference, _, _ = caches
        lazy = LazyCatalog(tmp / "ref")
        assert lazy.num_patches == reference.num_patches
        assert lazy.get_num_records() == reference.get_num_records()
        assert_allclose(
            lazy.get_sum_weights(), reference.get_sum_weights(), rtol=1e-12
        )
        # applied centers are preserved through the cache metadata
        assert_allclose(
            lazy.patch_centers_xyz, reference.patch_centers_xyz, atol=5e-15
        )
        assert_allclose(
            lazy.patch_radii, reference.patch_radii, rtol=1e-12
        )
        assert lazy.has_weights and lazy.has_redshifts

    def test_catalogs_support_weakrefs(self, caches):
        """The blocked-path tile caches key catalogs through weakrefs
        (`correlation.blocked._WeakId`); both catalog types must stay
        weak-referenceable (Catalog slots __weakref__ explicitly,
        LazyCatalog gets it from its slot-less HandlesDataChunk base —
        this test pins the dependency either way)."""
        import weakref

        tmp, reference, _, _ = caches
        lazy = LazyCatalog(tmp / "ref")
        assert weakref.ref(reference)() is reference
        assert weakref.ref(lazy)() is lazy

    def test_load_block_matches_resident(self, caches):
        tmp, reference, _, _ = caches
        lazy = LazyCatalog(tmp / "ref")
        mem = reference.load_block(1, 4)
        disk = lazy.load_block(1, 4)
        assert_allclose(np.sort(disk.xyz, axis=0), np.sort(mem.xyz, axis=0))
        np.testing.assert_array_equal(
            np.bincount(disk.patch_ids), np.bincount(mem.patch_ids)
        )

    def test_bin_sum_weights(self, caches):
        tmp, reference, _, _ = caches
        from yet_another_wizz_tpu.binning import Binning

        lazy = LazyCatalog(tmp / "ref")
        binning = Binning(np.linspace(0.1, 1.0, 6))
        assert_allclose(
            lazy.bin_sum_weights(binning, 5),
            reference.bin_sum_weights(binning, 5),
            rtol=1e-12,
        )
        assert_allclose(
            lazy.bin_sum_weights(None, 5),
            reference.bin_sum_weights(None, 5),
            rtol=1e-12,
        )

    def test_full_tile_path_raises_with_guidance(self, caches):
        tmp, _, _, _ = caches
        lazy = LazyCatalog(tmp / "ref")
        with pytest.raises(NotImplementedError, match="max_resident_patches"):
            lazy.get_tiles(None)


class TestLazyMeasurement:
    def test_blocked_crosscorrelation_matches_resident(self, caches):
        tmp, reference, unknown, randoms = caches
        config = Configuration.create(
            rmin=500, rmax=3000, unit="kpc", zmin=0.15, zmax=1.0, num_bins=4,
        )
        (resident,) = crosscorrelate(
            config, reference, unknown, ref_rand=randoms, backend="xla",
        )
        lazy_ref = LazyCatalog(tmp / "ref")
        lazy_unk = LazyCatalog(tmp / "unk")
        lazy_rand = LazyCatalog(tmp / "rand")
        (lazy,) = crosscorrelate(
            config, lazy_ref, lazy_unk, ref_rand=lazy_rand,
            backend="xla", max_resident_patches=3,
        )
        assert_allclose(
            lazy.sample().data, resident.sample().data, rtol=1e-5
        )

    def test_blocked_autocorrelation_matches_resident(self, caches):
        tmp, reference, _, randoms = caches
        config = Configuration.create(
            rmin=500, rmax=3000, unit="kpc", zmin=0.15, zmax=1.0, num_bins=4,
        )
        (resident,) = autocorrelate(
            config, reference, randoms, backend="xla",
        )
        (lazy,) = autocorrelate(
            config, LazyCatalog(tmp / "ref"), LazyCatalog(tmp / "rand"),
            backend="xla", max_resident_patches=2,
        )
        assert_allclose(
            lazy.sample().data, resident.sample().data, rtol=1e-5
        )

    def test_full_path_raises_for_lazy(self, caches):
        tmp, reference, _, randoms = caches
        config = Configuration.create(
            rmin=500, rmax=3000, unit="kpc", zmin=0.15, zmax=1.0, num_bins=4,
        )
        with pytest.raises(NotImplementedError, match="max_resident_patches"):
            autocorrelate(
                config, LazyCatalog(tmp / "ref"), LazyCatalog(tmp / "rand"),
                backend="xla",
            )


class TestLazyRobustness:
    def test_load_block_clamps_out_of_range(self, caches):
        tmp, reference, _, _ = caches
        lazy = LazyCatalog(tmp / "ref")
        mem = reference.load_block(0, 2)
        disk = lazy.load_block(-3, 2)  # clamps like the resident mask
        assert len(disk.xyz) == len(mem.xyz)
        wide = lazy.load_block(0, 99)
        assert len(wide.xyz) == sum(reference.get_num_records())
        with pytest.raises(ValueError, match="empty patch block"):
            lazy.load_block(5, 3)

    def test_bin_sum_weights_memo_isolated(self, caches):
        from yet_another_wizz_tpu.binning import Binning

        tmp, _, _, _ = caches
        lazy = LazyCatalog(tmp / "ref")
        binning = Binning(np.linspace(0.1, 1.0, 6))
        first = lazy.bin_sum_weights(binning, 5)
        first[:] = -1.0  # caller mutation must not corrupt the memo
        second = lazy.bin_sum_weights(binning, 5)
        assert np.all(second >= 0.0)

    def test_empty_execution_section_accepted(self):
        from yet_another_wizz_tpu.cli.config import ProjectConfig

        # an `execution:` key with all options commented parses to None
        config = ProjectConfig.from_dict(dict(
            correlation=dict(
                scales=dict(rmin=500, rmax=3000, unit="kpc"),
                binning=dict(zmin=0.15, zmax=1.0, num_bins=3),
            ),
            tasks=["estimate"],
            execution=None,
        ))
        assert config.execution.max_resident_patches is None
        assert config.execution.lazy is False
