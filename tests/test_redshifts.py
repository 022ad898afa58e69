import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu import Catalog, Configuration
from yet_another_wizz_tpu.binning import Binning
from yet_another_wizz_tpu.correlation.corrdata import CorrData
from yet_another_wizz_tpu.redshifts import (
    HistData,
    RedshiftData,
    resample_bootstrap,
    resample_jackknife,
)


@pytest.fixture
def catalog(rng):
    n = 2000
    return Catalog.from_arrays(
        rng.uniform(10, 20, n),
        rng.uniform(-5, 5, n),
        redshifts=rng.uniform(0.1, 1.0, n),
        weights=rng.uniform(0.5, 2.0, n),
        patch_num=5,
    )


@pytest.fixture
def config():
    return Configuration.create(
        rmin=100, rmax=1000, zmin=0.1, zmax=1.0, num_bins=6
    )


class TestResampling:
    def test_jackknife(self, rng):
        obs = rng.uniform(0, 1, (4, 3))
        samples = resample_jackknife(obs)
        for k in range(4):
            assert_allclose(samples[k], np.delete(obs, k, axis=0).sum(axis=0))

    def test_bootstrap_deterministic(self, rng):
        obs = rng.uniform(0, 1, (4, 3))
        assert np.array_equal(
            resample_bootstrap(obs, 10), resample_bootstrap(obs, 10)
        )


class TestHistData:
    def test_total_counts(self, catalog, config):
        hist = HistData.from_catalog(catalog, config)
        # all redshifts in range; the open left edge excludes z == zmin
        z = catalog.redshifts
        w = catalog.weights
        mask = z > 0.1
        assert_allclose(hist.data.sum(), w[mask].sum(), rtol=1e-12)

    def test_matches_numpy_histogram(self, catalog, config):
        hist = HistData.from_catalog(catalog, config)
        z = catalog.redshifts
        w = catalog.weights
        mask = z > config.binning.binning.edges[0]
        expect, _ = np.histogram(
            z[mask], config.binning.binning.edges, weights=w[mask]
        )
        assert_allclose(hist.data, expect, rtol=1e-10)

    def test_exact_edge_values(self):
        """Values exactly on the outer edges follow the binning's closed
        semantics: closed=right drops z == edges[0], closed=left drops
        z == edges[-1] (the digitize path, no explicit masking)."""
        z = np.array([0.2, 0.2, 0.5, 0.8])
        n = len(z)
        catalog = Catalog.from_arrays(
            np.linspace(10, 20, n),
            np.linspace(-5, 5, n),
            redshifts=z,
            patch_num=2,
        )
        edges = np.array([0.2, 0.5, 0.8])
        right = HistData.from_catalog(catalog, Binning(edges, closed="right"))
        # bins (0.2, 0.5], (0.5, 0.8]: both z == 0.2 drop on the open edge
        assert_allclose(right.data, [1, 1])
        left = HistData.from_catalog(catalog, Binning(edges, closed="left"))
        # bins [0.2, 0.5), [0.5, 0.8): z == 0.8 drops on the open edge
        assert_allclose(left.data, [2, 1])

    def test_jackknife_samples(self, catalog, config):
        hist = HistData.from_catalog(catalog, config)
        assert hist.num_samples == catalog.num_patches
        assert np.all(np.isfinite(hist.error))

    def test_normalised(self, catalog, config):
        hist = HistData.from_catalog(catalog, config).normalised()
        integral = np.sum(hist.binning.dz * hist.data)
        assert_allclose(abs(integral), 1.0, rtol=1e-10)

    def test_requires_redshifts(self, rng, config):
        catalog = Catalog.from_arrays(
            rng.uniform(10, 20, 100), rng.uniform(-5, 5, 100), patch_num=2
        )
        with pytest.raises(ValueError, match="redshifts"):
            HistData.from_catalog(catalog, config)


class TestRedshiftData:
    def make_corrdata(self, rng, value=1.0):
        binning = Binning(np.linspace(0.1, 1.0, 7))
        data = np.full(6, value)
        samples = data[None, :] + rng.normal(0, 0.01, (5, 6))
        return CorrData(binning, data, samples)

    def test_from_corrdata_formula(self, rng):
        cross = self.make_corrdata(rng, 2.0)
        ref = self.make_corrdata(rng, 4.0)
        unk = self.make_corrdata(rng, 0.25)
        nz = RedshiftData.from_corrdata(cross, ref, unk)
        dz = cross.binning.dz
        assert_allclose(nz.data, 2.0 / np.sqrt(dz**2 * 4.0 * 0.25))

    def test_without_bias_correction(self, rng):
        cross = self.make_corrdata(rng, 2.0)
        nz = RedshiftData.from_corrdata(cross)
        assert_allclose(nz.data, 2.0 / cross.binning.dz)

    def test_incompatible_inputs(self, rng):
        cross = self.make_corrdata(rng)
        other = CorrData(
            Binning(np.linspace(0.1, 1.0, 5)), np.ones(4), np.ones((5, 4))
        )
        with pytest.raises(ValueError):
            RedshiftData.from_corrdata(cross, other)

    def test_normalised_integral(self, rng):
        nz = RedshiftData.from_corrdata(self.make_corrdata(rng, 2.0))
        normed = nz.normalised()
        assert_allclose(np.nansum(normed.binning.dz * normed.data), 1.0)

    def test_normalised_to_target_matches_curve_fit(self, rng):
        """The closed-form normalisation must reproduce the reference's
        scipy.optimize.curve_fit solution."""
        import scipy.optimize

        nz = RedshiftData.from_corrdata(self.make_corrdata(rng, 2.0))
        target_data = np.abs(rng.normal(1.0, 0.3, nz.num_bins))
        target = CorrData(
            nz.binning, target_data, target_data[None, :] + np.zeros((5, 1))
        )

        y_from, y_target = nz.data, target.data
        mask = np.isfinite(y_from) & np.isfinite(y_target) & (y_target > 0)
        popt, _ = scipy.optimize.curve_fit(
            lambda _, norm: y_from[mask] / norm,
            xdata=target.binning.mids[mask],
            ydata=y_target[mask],
            p0=[1.0],
            sigma=1 / y_target[mask],
        )
        normed = nz.normalised(target)
        assert_allclose(normed.data, nz.data / popt[0], rtol=1e-6)


def test_hist_from_lazy_catalog_matches_memory(tmp_path):
    """HistData.from_catalog works on out-of-core LazyCatalogs with
    bounded memory (block-by-block histogramming) and reproduces the
    memory-resident result exactly."""
    import numpy as np

    from yet_another_wizz_tpu import Catalog
    from yet_another_wizz_tpu.binning import Binning
    from yet_another_wizz_tpu.catalog.lazy import LazyCatalog
    from yet_another_wizz_tpu.examples import generate_mock_data
    from yet_another_wizz_tpu.redshifts import HistData

    mock = generate_mock_data(2000, 2000, 2000, seed=3)
    cat = Catalog.from_arrays(
        cache_directory=tmp_path / "c", **mock["reference"],
        degrees=False, patch_num=5,
    )
    lazy = LazyCatalog(tmp_path / "c")
    binning = Binning(np.linspace(0.15, 1.0, 5))
    h_lazy = HistData.from_catalog(lazy, binning)
    h_mem = HistData.from_catalog(cat, binning)
    np.testing.assert_allclose(h_lazy.data, h_mem.data, rtol=1e-12)
    np.testing.assert_allclose(h_lazy.samples, h_mem.samples, rtol=1e-12)
