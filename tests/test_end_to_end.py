"""End-to-end pipeline: mock catalogs -> pair counts -> estimators -> n(z),
validated against the float64 scipy kd-tree path at every stage.

Mirrors the reference's golden-output regression strategy
(/root/reference/tests/test_setups.py:149-168): the full pipeline on the
bundled example data must reproduce the independently computed result to
high precision.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu import Catalog, Configuration
from yet_another_wizz_tpu.correlation.measurements import (
    autocorrelate,
    crosscorrelate,
)
from yet_another_wizz_tpu.examples import generate_mock_data
from yet_another_wizz_tpu.redshifts import HistData, RedshiftData


@pytest.fixture(scope="module")
def mock_catalogs():
    mock = generate_mock_data(
        num_reference=4000, num_unknown=6000, num_randoms=12000, seed=3
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
    return reference, unknown, randoms


@pytest.fixture(scope="module")
def config():
    return Configuration.create(
        rmin=500, rmax=3000, unit="kpc", zmin=0.15, zmax=1.0, num_bins=5
    )


def run_nz(config, reference, unknown, randoms, backend, **sample_kwargs):
    (w_sp,) = crosscorrelate(
        config, reference, unknown, ref_rand=randoms, backend=backend
    )
    (w_ss,) = autocorrelate(config, reference, randoms, backend=backend)
    return RedshiftData.from_corrfuncs(w_sp, w_ss, **sample_kwargs)


class TestGoldenPipeline:
    def test_nz_engine_matches_oracle(self, mock_catalogs, config):
        reference, unknown, randoms = mock_catalogs
        nz_engine = run_nz(config, reference, unknown, randoms, "xla")
        nz_oracle = run_nz(config, reference, unknown, randoms, "oracle")

        assert np.all(np.isfinite(nz_engine.data))
        assert_allclose(nz_engine.data, nz_oracle.data, rtol=1e-5)
        assert_allclose(nz_engine.samples, nz_oracle.samples, rtol=1e-4)
        assert_allclose(nz_engine.error, nz_oracle.error, rtol=1e-3)

    def test_signal_recovered(self, mock_catalogs, config):
        """The mock has a flat n(z): the estimate must be positive in every
        bin and the histogram flat-ish."""
        reference, unknown, randoms = mock_catalogs
        nz = run_nz(config, reference, unknown, randoms, "xla").normalised()
        assert np.all(nz.data > 0)

        hist = HistData.from_catalog(unknown, config).normalised()
        assert np.all(hist.data > 0)
        # normalised n(z) should track the true distribution within a few
        # sigma; the outer bins are skipped (the mock clips its redshift
        # scatter at the range boundaries, which piles up histogram counts
        # there)
        pull = (nz.data - hist.data) / np.sqrt(
            nz.error**2 + hist.error**2
        )
        assert np.all(np.abs(pull[1:-1]) < 5)

    def test_bootstrap_covariance(self, mock_catalogs, config):
        reference, unknown, randoms = mock_catalogs
        nz_boot = run_nz(
            config, reference, unknown, randoms, "xla",
            method="bootstrap", num_samples=200,
        )
        nz_jack = run_nz(config, reference, unknown, randoms, "xla")
        assert nz_boot.num_samples == 200
        assert np.all(np.isfinite(nz_boot.error))
        # both methods must agree on the data vector and roughly on errors
        assert_allclose(nz_boot.data, nz_jack.data, rtol=1e-12)
        ratio = nz_boot.error / nz_jack.error
        assert np.all((ratio > 0.3) & (ratio < 3.0))

    def test_landy_szalay_with_both_randoms(self, mock_catalogs, config):
        reference, unknown, randoms = mock_catalogs
        mock2 = generate_mock_data(
            num_reference=10, num_unknown=10, num_randoms=9000, seed=17
        )
        unk_rand = Catalog.from_arrays(
            **mock2["randoms"], degrees=False,
            patch_centers=reference.get_centers(),
        )
        (w_sp,) = crosscorrelate(
            config, reference, unknown,
            ref_rand=randoms, unk_rand=unk_rand, backend="xla",
        )
        assert w_sp.rr is not None
        assert w_sp.get_estimator().name == "LS"
        data = w_sp.sample()
        assert np.all(np.isfinite(data.data))

    def test_multi_scale(self, mock_catalogs, config):
        reference, unknown, randoms = mock_catalogs
        multi = config.modify(rmin=[500, 1500], rmax=[1500, 4500])
        results = crosscorrelate(
            multi, reference, unknown, ref_rand=randoms, backend="xla"
        )
        assert len(results) == 2
        small = results[0].sample()
        large = results[1].sample()
        # clustering amplitude decreases with scale in the mock
        assert np.nanmean(small.data) > np.nanmean(large.data)

    def test_rweight_pipeline(self, mock_catalogs, config):
        reference, unknown, randoms = mock_catalogs
        weighted = config.modify(rweight=-1.0, resolution=10)
        nz_engine = run_nz(weighted, reference, unknown, randoms, "xla")
        nz_oracle = run_nz(weighted, reference, unknown, randoms, "oracle")
        assert_allclose(nz_engine.data, nz_oracle.data, rtol=1e-5)


class TestAutocorrelationConventions:
    def test_autocorr_consistency_engine_vs_oracle(self, mock_catalogs, config):
        reference, _, randoms = mock_catalogs
        (engine,) = autocorrelate(config, reference, randoms, backend="xla")
        (oracle,) = autocorrelate(config, reference, randoms, backend="oracle")
        assert_allclose(
            engine.dd.counts.counts, oracle.dd.counts.counts,
            rtol=1e-4, atol=10.0,
        )
        e = engine.sample()
        o = oracle.sample()
        assert_allclose(e.data, o.data, rtol=1e-5)

    def test_no_rr(self, mock_catalogs, config):
        reference, _, randoms = mock_catalogs
        (corr,) = autocorrelate(
            config, reference, randoms, count_rr=False, backend="xla"
        )
        assert corr.rr is None
        assert corr.get_estimator().name == "DP"

    def test_unique_catalogs_enforced(self, mock_catalogs, config):
        reference, _, randoms = mock_catalogs
        with pytest.raises(ValueError, match="separate"):
            autocorrelate(config, reference, reference)


class TestEstimatorOverride:
    """`sample(estimator=...)` forces a registered estimator (reference
    auto-selects only, /root/reference/src/yaw/correlation/corrfunc.py:238)."""

    @pytest.fixture(scope="class")
    def corrfunc_with_rr(self, mock_catalogs, config):
        reference, _, randoms = mock_catalogs
        (w_ss,) = autocorrelate(
            config, reference, randoms, backend="xla", count_rr=True
        )
        return w_ss

    def test_default_is_landy_szalay(self, corrfunc_with_rr):
        auto = corrfunc_with_rr.sample()
        forced = corrfunc_with_rr.sample(estimator="LS")
        assert_allclose(forced.data, auto.data, rtol=1e-12)

    def test_force_davis_peebles_ignores_rr(self, mock_catalogs, config, corrfunc_with_rr):
        reference, _, randoms = mock_catalogs
        forced = corrfunc_with_rr.sample(estimator="DP")
        (no_rr,) = autocorrelate(
            config, reference, randoms, backend="xla", count_rr=False
        )
        assert_allclose(forced.data, no_rr.sample().data, rtol=1e-10)

    def test_force_ls_without_rr_raises(self, mock_catalogs, config):
        from yet_another_wizz_tpu.models.estimators import EstimatorError

        reference, _, randoms = mock_catalogs
        (w_ss,) = autocorrelate(
            config, reference, randoms, backend="xla", count_rr=False
        )
        with pytest.raises(EstimatorError, match="RR"):
            w_ss.sample(estimator="LS")

    def test_unknown_estimator_name(self, corrfunc_with_rr):
        with pytest.raises(ValueError, match="unknown estimator"):
            corrfunc_with_rr.sample(estimator="XX")
