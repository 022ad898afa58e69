import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_almost_equal

from yet_another_wizz_tpu.binning import Binning
from yet_another_wizz_tpu.correlation.corrdata import (
    CorrData,
    SampledData,
    cov_from_samples,
)


@pytest.fixture
def sampled(rng):
    binning = Binning([0.1, 0.3, 0.5, 0.8])
    data = rng.normal(1.0, 0.1, 3)
    samples = data[None, :] + rng.normal(0, 0.02, (8, 3))
    return SampledData(binning, data, samples)


class TestCovariance:
    def test_jackknife_scaling(self, rng):
        samples = rng.normal(0, 1, (20, 4))
        cov = cov_from_samples(samples)
        assert_allclose(cov, np.cov(samples, rowvar=False, ddof=0) * 19)

    def test_var_kind(self, rng):
        samples = rng.normal(0, 1, (20, 4))
        cov = cov_from_samples(samples, kind="var")
        assert np.count_nonzero(cov - np.diag(np.diag(cov))) == 0

    def test_diag_kind_joint(self, rng):
        samples = [rng.normal(0, 1, (20, 3)), rng.normal(0, 1, (20, 3))]
        cov = cov_from_samples(samples, kind="diag")
        assert cov.shape == (6, 6)
        # block cross-diagonals retained, off-diagonals inside block zeroed
        assert cov[0, 3] != 0 and cov[0, 1] == 0

    def test_single_sample_nan(self):
        cov = cov_from_samples(np.ones((1, 3)))
        assert np.all(np.isnan(cov))


class TestSampledData:
    def test_validation(self, rng):
        binning = Binning([0.1, 0.3, 0.5])
        with pytest.raises(ValueError, match="unexpected shape"):
            SampledData(binning, np.zeros(3), np.zeros((5, 2)))
        with pytest.raises(ValueError, match="two-dimensional"):
            SampledData(binning, np.zeros(2), np.zeros(2))
        with pytest.raises(ValueError, match="number of bins"):
            SampledData(binning, np.zeros(2), np.zeros((5, 3)))

    def test_error_and_correlation(self, sampled):
        assert sampled.error.shape == (3,)
        corr = sampled.correlation
        assert_allclose(np.diag(corr), 1.0)

    def test_arithmetic(self, sampled):
        total = sampled + sampled
        assert_allclose(total.data, 2 * sampled.data)
        zero = sampled - sampled
        assert_allclose(zero.data, 0.0)

    def test_bin_slicing(self, sampled):
        sub = sampled.bins[1:]
        assert sub.num_bins == 2
        assert sub.samples.shape == (8, 2)
        single = sampled.bins[0]
        assert single.samples.shape == (8, 1)

    def test_compatibility(self, sampled, rng):
        other = SampledData(
            sampled.binning.copy(), sampled.data, sampled.samples[:4]
        )
        assert not sampled.is_compatible(other)
        with pytest.raises(ValueError, match="number of samples"):
            sampled.is_compatible(other, require=True)


class TestCorrDataAscii:
    def test_roundtrip(self, sampled, tmp_path):
        corr = CorrData(sampled.binning, sampled.data, sampled.samples)
        prefix = tmp_path / "corr"
        corr.to_files(prefix)
        assert (tmp_path / "corr.dat").exists()
        assert (tmp_path / "corr.smp").exists()
        assert (tmp_path / "corr.cov").exists()

        clone = CorrData.from_files(prefix)
        assert clone.binning == corr.binning
        assert_array_almost_equal(clone.data, corr.data)
        assert_array_almost_equal(clone.samples, corr.samples)

    def test_single_bin_roundtrip(self, rng, tmp_path):
        # a one-row file must not collapse to 1-D on load
        binning = Binning([0.1, 0.5])
        corr = CorrData(binning, np.array([2.0]), rng.normal(size=(8, 1)))
        corr.to_files(tmp_path / "corr")
        clone = CorrData.from_files(tmp_path / "corr")
        assert clone.binning == corr.binning
        assert_array_almost_equal(clone.data, corr.data)
        assert clone.samples.shape == (8, 1)
        assert_array_almost_equal(clone.samples, corr.samples)

    def test_closed_left_preserved(self, rng, tmp_path):
        binning = Binning([0.1, 0.3, 0.5], closed="left")
        corr = CorrData(binning, np.ones(2), np.ones((4, 2)))
        corr.to_files(tmp_path / "corr")
        clone = CorrData.from_files(tmp_path / "corr")
        assert str(clone.binning.closed) == "left"

    def test_header_content(self, sampled, tmp_path):
        corr = CorrData(sampled.binning, sampled.data, sampled.samples)
        corr.to_files(tmp_path / "corr")
        header = (tmp_path / "corr.dat").read_text().splitlines()[1]
        assert "z_low" in header and "nz_err" in header
