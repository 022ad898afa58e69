import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu import Catalog
from yet_another_wizz_tpu.binning import Binning
from yet_another_wizz_tpu.catalog.patch import Patch
from yet_another_wizz_tpu.randoms import BoxRandoms


@pytest.fixture
def arrays(rng):
    n = 2000
    return dict(
        ra=rng.uniform(10, 30, n),
        dec=rng.uniform(-10, 10, n),
        weights=rng.uniform(0.5, 2.0, n),
        redshifts=rng.uniform(0.1, 1.2, n),
    )


class TestPatchModes:
    def test_patch_num_kmeans(self, arrays):
        catalog = Catalog.from_arrays(**arrays, patch_num=6)
        assert catalog.num_patches == 6
        assert min(catalog.get_num_records()) > 0

    def test_patch_centers_from_catalog(self, arrays, rng):
        first = Catalog.from_arrays(**arrays, patch_num=5)
        other = Catalog.from_arrays(
            ra=rng.uniform(10, 30, 500),
            dec=rng.uniform(-10, 10, 500),
            patch_centers=first,
        )
        assert other.num_patches == 5
        dist = first.get_centers().distance(other.get_centers())
        assert np.all(dist.data < 0.1)

    def test_patch_centers_coordinates(self, arrays):
        from yet_another_wizz_tpu.coordinates import AngularCoordinates

        centers = AngularCoordinates(
            np.deg2rad([[15.0, -5.0], [25.0, 5.0]])
        )
        catalog = Catalog.from_arrays(**arrays, patch_centers=centers)
        assert catalog.num_patches == 2

    def test_explicit_patch_ids(self, arrays):
        ids = (np.arange(len(arrays["ra"])) % 3).astype(np.int16)
        catalog = Catalog.from_arrays(**arrays, patch_ids=ids)
        assert catalog.num_patches == 3
        assert np.array_equal(catalog.patch_ids, ids)

    def test_missing_mode(self, arrays):
        with pytest.raises(ValueError, match="patch_centers"):
            Catalog.from_arrays(**arrays)

    def test_kmeans_deterministic(self, arrays):
        a = Catalog.from_arrays(**arrays, patch_num=4)
        b = Catalog.from_arrays(**arrays, patch_num=4)
        assert np.array_equal(a.patch_ids, b.patch_ids)


class TestMappingInterface:
    def test_patch_views(self, arrays):
        catalog = Catalog.from_arrays(**arrays, patch_num=4)
        assert len(catalog) == 4
        patch = catalog[2]
        assert patch.meta.num_records == catalog.get_num_records()[2]
        assert patch.has_weights and patch.has_redshifts
        total = sum(catalog[i].meta.sum_weights for i in catalog)
        assert_allclose(total, arrays["weights"].sum(), rtol=1e-12)
        with pytest.raises(KeyError):
            catalog[99]

    def test_geometry_accessors(self, arrays):
        catalog = Catalog.from_arrays(**arrays, patch_num=4)
        centers = catalog.get_centers()
        radii = catalog.get_radii()
        assert len(centers) == 4 and len(radii) == 4
        # all points lie within their patch radius
        for pid in catalog:
            patch = catalog[pid]
            dist = patch.coords.distance(centers[pid])
            assert np.all(dist.data <= radii.data[pid] + 1e-12)


class TestDiskCache:
    def test_roundtrip(self, arrays, tmp_path):
        cache = tmp_path / "cache"
        catalog = Catalog.from_arrays(
            **arrays, patch_num=4, cache_directory=cache
        )
        assert (cache / "patch_0" / "data.bin").exists()
        assert (cache / "patch_0" / "meta.yml").exists()

        restored = Catalog(cache)
        assert restored.num_patches == 4
        assert restored.get_num_records() == catalog.get_num_records()
        assert_allclose(
            sorted(restored.redshifts), sorted(catalog.redshifts), rtol=1e-12
        )

    def test_patch_object_reads_cache(self, arrays, tmp_path):
        cache = tmp_path / "cache"
        catalog = Catalog.from_arrays(
            **arrays, patch_num=3, cache_directory=cache
        )
        patch = Patch(cache / "patch_1")
        assert patch.meta.num_records == catalog.get_num_records()[1]
        assert patch.weights is not None

    def test_writes_reference_patch_ids_file(self, arrays, tmp_path):
        """Caches carry the reference's patch_ids.bin (sorted int16,
        /root/reference/src/yaw/catalog/catalog.py:529-530) — the
        reference's open path REQUIRES it; ours must both write it and
        tolerate it when reopening (it matches the patch_* glob)."""
        import numpy as np

        cache = tmp_path / "cache"
        Catalog.from_arrays(**arrays, patch_num=4, cache_directory=cache)
        ids = np.fromfile(cache / "patch_ids.bin", dtype="i2")
        assert ids.tolist() == [0, 1, 2, 3]

        restored = Catalog(cache)  # must not trip over the file
        assert restored.num_patches == 4
        from yet_another_wizz_tpu.catalog import LazyCatalog

        assert LazyCatalog(cache).num_patches == 4

    def test_gapped_cache_rejected(self, arrays, tmp_path):
        """A cache with missing patch directories (e.g. from a failed
        ingestion) must be rejected, not silently loaded with
        out-of-range patch ids."""
        import shutil

        cache = tmp_path / "cache"
        Catalog.from_arrays(**arrays, patch_num=4, cache_directory=cache)
        shutil.rmtree(cache / "patch_2")
        with pytest.raises(ValueError, match="contiguous"):
            Catalog(cache)

    def test_no_overwrite(self, arrays, tmp_path):
        cache = tmp_path / "cache"
        Catalog.from_arrays(**arrays, patch_num=2, cache_directory=cache)
        with pytest.raises(FileExistsError):
            Catalog.from_arrays(**arrays, patch_num=2, cache_directory=cache)
        Catalog.from_arrays(
            **arrays, patch_num=2, cache_directory=cache, overwrite=True
        )


class TestConstructors:
    def test_from_dataframe(self, arrays):
        import pandas as pd

        frame = pd.DataFrame(
            dict(RA=arrays["ra"], DEC=arrays["dec"], Z=arrays["redshifts"])
        )
        catalog = Catalog.from_dataframe(
            None, frame, ra_name="RA", dec_name="DEC", redshift_name="Z",
            patch_num=3,
        )
        assert catalog.num_patches == 3
        assert catalog.has_redshifts and not catalog.has_weights

    def test_from_file_parquet(self, arrays, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = tmp_path / "cat.pqt"
        pq.write_table(
            pa.table(dict(ra=arrays["ra"], dec=arrays["dec"])), path
        )
        catalog = Catalog.from_file(
            None, path, ra_name="ra", dec_name="dec", patch_num=3
        )
        assert len(catalog.ra) == len(arrays["ra"])

    def test_from_random(self):
        generator = BoxRandoms(0, 20, -10, 10, seed=3)
        catalog = Catalog.from_random(None, generator, 5000, patch_num=4)
        assert catalog.num_patches == 4
        assert len(catalog.ra) == 5000


class TestTiles:
    def test_tile_cache_reuse(self, arrays):
        catalog = Catalog.from_arrays(**arrays, patch_num=3)
        binning = Binning([0.1, 0.5, 1.2])
        first = catalog.get_tiles(binning)
        again = catalog.get_tiles(binning)
        assert first is again
        unbinned = catalog.get_tiles(None)
        assert unbinned is not first
        assert not unbinned.binned

    def test_kappa_mode_requires_kappa(self, arrays):
        catalog = Catalog.from_arrays(**arrays, patch_num=3)
        with pytest.raises(ValueError, match="kappa"):
            catalog.get_tiles(None, mode="k")

    def test_build_trees_api(self, arrays):
        catalog = Catalog.from_arrays(**arrays, patch_num=3)
        catalog.build_trees(np.linspace(0.1, 1.2, 5), closed="right")
        assert len(catalog._tile_cache) == 1


class TestReferenceParityMembers:
    """Reference members: Metadata dict round trip, Patch.has_patch_ids,
    chunk-info copying and DataChunk.hasattr
    (/root/reference/src/yaw/catalog/patch.py:44-395, datachunk.py:145-320)."""

    def test_metadata_dict_roundtrip(self, arrays):
        from yet_another_wizz_tpu.catalog.patch import Metadata
        from yet_another_wizz_tpu.coordinates import AngularCoordinates

        coords = AngularCoordinates(
            np.column_stack([arrays["ra"], arrays["dec"]])
        )
        meta = Metadata.compute(coords, weights=arrays.get("weights"))
        restored = Metadata.from_dict(meta.to_dict())
        assert restored.num_records == meta.num_records
        assert restored.sum_weights == meta.sum_weights
        assert_allclose(restored.center.data, meta.center.data)
        assert_allclose(restored.radius.data, meta.radius.data)

    def test_patch_has_no_patch_ids(self, arrays, tmp_path):
        Catalog.from_arrays(
            **arrays, patch_num=3, cache_directory=tmp_path / "cache"
        )
        patch = Patch(tmp_path / "cache" / "patch_0")
        # ids are implicit in the patch directory, never stored per row
        assert patch.has_patch_ids is False
        info = patch.copy_chunk_info()
        assert info.has_patch_ids is False

    def test_copy_chunk_info_drop_patch_ids(self):
        from yet_another_wizz_tpu.datachunk import (
            DataChunkInfo, HandlesDataChunk,
        )

        class Holder(HandlesDataChunk):
            def __init__(self):
                self._chunk_info = DataChunkInfo(
                    has_weights=True, has_patch_ids=True
                )

        holder = Holder()
        assert holder.has_patch_ids
        dropped = holder.copy_chunk_info(drop_patch_ids=True)
        assert dropped.has_patch_ids is False and dropped.has_weights
        assert holder.has_patch_ids  # the original is untouched

    def test_datachunk_hasattr(self, arrays):
        from yet_another_wizz_tpu.datachunk import DataChunk

        chunk = DataChunk.create(
            arrays["ra"], arrays["dec"], degrees=False,
            weights=arrays.get("weights"),
        )
        assert DataChunk.hasattr(chunk, "ra")
        assert not DataChunk.hasattr(chunk, "redshifts")
