import h5py
import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu.binning import Binning
from yet_another_wizz_tpu.correlation.paircounts import (
    NormalisedCounts,
    NormalisedScalarCounts,
    PatchedCounts,
    PatchedSumWeights,
    bootstrap_multiplicities,
)


@pytest.fixture
def binning():
    return Binning([0.1, 0.3, 0.5, 0.8])


@pytest.fixture
def patched_counts(binning, rng):
    return PatchedCounts(binning, rng.uniform(0, 10, (3, 5, 5)), auto=False)


class TestJackknife:
    def test_matches_bruteforce_leave_one_out(self, patched_counts):
        sampled = patched_counts.sample_patch_sum()
        array = patched_counts.counts
        for k in range(5):
            keep = [i for i in range(5) if i != k]
            brute = array[np.ix_(range(3), keep, keep)].sum(axis=(1, 2))
            assert_allclose(sampled.samples[k], brute, rtol=1e-12)

    def test_total(self, patched_counts):
        sampled = patched_counts.sample_patch_sum()
        assert_allclose(sampled.data, patched_counts.counts.sum(axis=(1, 2)))


class TestBootstrap:
    def test_multiplicities(self):
        mult = bootstrap_multiplicities(8, 100, seed=1)
        assert mult.shape == (100, 8)
        assert_allclose(mult.sum(axis=1), 8.0)
        # deterministic
        assert np.array_equal(mult, bootstrap_multiplicities(8, 100, seed=1))

    def test_matches_bruteforce(self, patched_counts):
        sampled = patched_counts.sample_patch_sum("bootstrap", num_samples=10)
        mult = bootstrap_multiplicities(5, 10)
        array = patched_counts.counts
        for r in range(10):
            brute = np.einsum("bij,i,j->b", array, mult[r], mult[r])
            assert_allclose(sampled.samples[r], brute, rtol=1e-12)


class TestPatchedSumWeights:
    def test_outer_product(self, binning, rng):
        sw1 = rng.uniform(1, 2, (3, 4))
        sw2 = rng.uniform(1, 2, (3, 4))
        weights = PatchedSumWeights(binning, sw1, sw2, auto=False)
        array = weights.get_array()
        assert_allclose(array[1], np.outer(sw1[1], sw2[1]))

    def test_auto_triangle_with_half_diagonal(self, binning, rng):
        sw = rng.uniform(1, 2, (3, 4))
        weights = PatchedSumWeights(binning, sw, sw, auto=True)
        array = weights.get_array()
        # lower triangle zero, diagonal halved
        assert np.all(array[:, 2, 1] == 0)
        assert_allclose(array[0, 1, 1], 0.5 * sw[0, 1] ** 2)
        assert_allclose(array[0, 0, 2], sw[0, 0] * sw[0, 2])

    def test_validation(self, binning):
        with pytest.raises(ValueError):
            PatchedSumWeights(binning, np.ones((2, 4)), np.ones((3, 4)), auto=False)
        with pytest.raises(ValueError):
            PatchedSumWeights(binning, np.ones(4), np.ones(4), auto=False)


class TestPatchedCounts:
    def test_validation(self, binning):
        with pytest.raises(ValueError, match="expected 3 axes"):
            PatchedCounts(binning, np.zeros((3, 4)), auto=False)
        with pytest.raises(ValueError, match="redshift bins"):
            PatchedCounts(binning, np.zeros((2, 4, 4)), auto=False)
        with pytest.raises(ValueError, match="square"):
            PatchedCounts(binning, np.zeros((3, 4, 5)), auto=False)

    def test_set_patch_pair(self, binning):
        counts = PatchedCounts.zeros(binning, 4, auto=False)
        counts.set_patch_pair(1, 2, np.array([1.0, 2.0, 3.0]))
        assert_allclose(counts.counts[:, 1, 2], [1, 2, 3])

    def test_add_and_scale(self, patched_counts):
        doubled = patched_counts + patched_counts
        assert_allclose(doubled.counts, patched_counts.counts * 2)
        assert (patched_counts * 2.0) == doubled

    def test_bin_and_patch_slicing(self, patched_counts):
        assert patched_counts.bins[1].num_bins == 1
        sub = patched_counts.patches[1:3]
        assert sub.num_patches == 2
        assert_allclose(sub.counts, patched_counts.counts[:, 1:3, 1:3])

    def test_hdf_roundtrip(self, patched_counts, tmp_path):
        with h5py.File(tmp_path / "c.hdf", "w") as f:
            patched_counts.to_hdf(f)
        with h5py.File(tmp_path / "c.hdf", "r") as f:
            clone = PatchedCounts.from_hdf(f)
        assert clone == patched_counts


class TestNormalisedCounts:
    def test_sampling_normalisation(self, binning, rng):
        counts = PatchedCounts(binning, rng.uniform(0, 5, (3, 4, 4)), auto=False)
        sw = PatchedSumWeights(
            binning, rng.uniform(1, 2, (3, 4)), rng.uniform(1, 2, (3, 4)),
            auto=False,
        )
        normalised = NormalisedCounts(counts, sw)
        sampled = normalised.sample_patch_sum()
        expect = counts.sample_patch_sum()
        norm = sw.sample_patch_sum()
        assert_allclose(sampled.data, expect.data / norm.data)
        assert_allclose(sampled.samples, expect.samples / norm.samples)

    def test_mismatched_inputs(self, binning, rng):
        counts = PatchedCounts.zeros(binning, 4, auto=False)
        sw = PatchedSumWeights(
            binning, np.ones((3, 5)), np.ones((3, 5)), auto=False
        )
        with pytest.raises(ValueError, match="num_patches"):
            NormalisedCounts(counts, sw)

    def test_hdf_roundtrip(self, binning, rng, tmp_path):
        counts = PatchedCounts(binning, rng.uniform(0, 5, (3, 4, 4)), auto=True)
        sw = PatchedSumWeights(
            binning, rng.uniform(1, 2, (3, 4)), rng.uniform(1, 2, (3, 4)),
            auto=True,
        )
        normalised = NormalisedCounts(counts, sw)
        with h5py.File(tmp_path / "n.hdf", "w") as f:
            normalised.to_hdf(f)
        with h5py.File(tmp_path / "n.hdf", "r") as f:
            clone = NormalisedCounts.from_hdf(f)
        assert clone == normalised

    def test_scalar_counts_roundtrip(self, binning, rng, tmp_path):
        kappa = PatchedCounts(binning, rng.normal(0, 1, (3, 4, 4)), auto=False)
        number = PatchedCounts(binning, rng.uniform(1, 5, (3, 4, 4)), auto=False)
        scalar = NormalisedScalarCounts(kappa, number)
        with h5py.File(tmp_path / "s.hdf", "w") as f:
            scalar.to_hdf(f)
        with h5py.File(tmp_path / "s.hdf", "r") as f:
            clone = NormalisedScalarCounts.from_hdf(f)
        assert clone == scalar


class TestIndexers:
    """`.bins[...]` / `.patches[...]` slicing on the container hierarchy
    (reference: yaw.utils.abc BinwiseData/PatchwiseData indexers)."""

    @pytest.fixture()
    def corrfunc(self, rng):
        from yet_another_wizz_tpu.correlation.corrfunc import CorrFunc

        binning = Binning(np.linspace(0.2, 1.0, 6))
        num_patches = 4

        def normalised():
            counts = rng.uniform(0, 10, (5, num_patches, num_patches))
            sum1 = rng.uniform(1, 2, (5, num_patches))
            sum2 = rng.uniform(1, 2, (5, num_patches))
            return NormalisedCounts(
                PatchedCounts(binning, counts, auto=False),
                PatchedSumWeights(binning, sum1, sum2, auto=False),
            )

        return CorrFunc(normalised(), normalised())

    def test_bin_slice(self, corrfunc):
        sub = corrfunc.bins[1:4]
        assert sub.num_bins == 3
        assert_allclose(sub.binning.edges, corrfunc.binning.edges[1:5])
        assert_allclose(
            sub.dd.counts.counts, corrfunc.dd.counts.counts[1:4]
        )

    def test_bin_scalar_and_iteration(self, corrfunc):
        first = corrfunc.bins[0]
        assert first.num_bins == 1
        parts = list(corrfunc.bins)
        assert len(parts) == corrfunc.num_bins
        assert_allclose(
            parts[2].dd.counts.counts[0], corrfunc.dd.counts.counts[2]
        )

    def test_patch_slice(self, corrfunc):
        sub = corrfunc.patches[[0, 2]]
        assert sub.num_patches == 2
        assert_allclose(
            sub.dd.counts.counts,
            corrfunc.dd.counts.counts[:, [0, 2]][:, :, [0, 2]],
        )

    def test_sliced_sample_consistent(self, corrfunc):
        """Sampling a bin-slice equals slicing the full sample."""
        sub_sample = corrfunc.bins[1:4].sample()
        full_sample = corrfunc.sample()
        assert_allclose(sub_sample.data, full_sample.data[1:4], rtol=1e-12)
