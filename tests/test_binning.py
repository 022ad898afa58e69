import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu.binning import Binning, parse_binning


class TestParseBinning:
    def test_valid(self):
        edges = parse_binning([0.1, 0.2, 0.3])
        assert edges.dtype == np.float64

    def test_optional_none(self):
        assert parse_binning(None, optional=True) is None
        with pytest.raises(Exception):
            parse_binning(None)

    def test_rejects_non_monotonic(self):
        with pytest.raises(ValueError, match="monotonically"):
            parse_binning([0.1, 0.3, 0.2])
        with pytest.raises(ValueError, match="monotonically"):
            parse_binning([0.1, 0.1, 0.2])

    def test_rejects_bad_shape(self):
        with pytest.raises(ValueError):
            parse_binning([[0.1, 0.2]])
        with pytest.raises(ValueError):
            parse_binning([0.1])


class TestBinning:
    def setup_method(self):
        self.binning = Binning([0.0, 0.25, 0.5, 1.0])

    def test_accessors(self):
        assert len(self.binning) == 3
        assert_allclose(self.binning.mids, [0.125, 0.375, 0.75])
        assert_allclose(self.binning.left, [0.0, 0.25, 0.5])
        assert_allclose(self.binning.right, [0.25, 0.5, 1.0])
        assert_allclose(self.binning.dz, [0.25, 0.25, 0.5])

    def test_default_closed_right(self):
        assert str(self.binning.closed) == "right"

    def test_equality(self):
        assert self.binning == Binning([0.0, 0.25, 0.5, 1.0])
        assert self.binning != Binning([0.0, 0.25, 0.5, 1.0], closed="left")
        assert self.binning != Binning([0.0, 0.25, 0.5])

    def test_slicing(self):
        sub = self.binning[1:]
        assert_allclose(sub.edges, [0.25, 0.5, 1.0])
        single = self.binning[0]
        assert_allclose(single.edges, [0.0, 0.25])

    def test_iteration(self):
        singles = list(self.binning)
        assert len(singles) == 3
        assert_allclose(singles[-1].edges, [0.5, 1.0])

    def test_copy_is_independent(self):
        copy = self.binning.copy()
        copy.edges[0] = -1.0
        assert self.binning.edges[0] == 0.0

    def test_pickle_roundtrip(self):
        import pickle

        clone = pickle.loads(pickle.dumps(self.binning))
        assert clone == self.binning

    def test_hdf_roundtrip(self, tmp_path):
        import h5py

        path = tmp_path / "binning.hdf"
        with h5py.File(path, "w") as f:
            self.binning.to_hdf(f)
        with h5py.File(path, "r") as f:
            clone = Binning.from_hdf(f)
        assert clone == self.binning

    def test_digitize_closed_right(self):
        # (0, 0.25], (0.25, 0.5], (0.5, 1]
        idx = self.binning.digitize([0.0, 0.25, 0.3, 1.0, 1.1])
        assert np.array_equal(idx, [0, 1, 2, 3, 4])

    def test_digitize_closed_left(self):
        binning = Binning([0.0, 0.25, 0.5, 1.0], closed="left")
        idx = binning.digitize([0.0, 0.25, 0.3, 1.0, 1.1])
        assert np.array_equal(idx, [1, 2, 2, 4, 4])


def test_load_legacy_binning(tmp_path):
    """Pre-v3 reference layout: (left, right) pairs in a 'binning' dataset
    (/root/reference/src/yaw/binning.py legacy loader parity)."""
    import h5py

    from yet_another_wizz_tpu.binning import load_legacy_binning

    edges = np.linspace(0.1, 0.9, 5)
    pairs = np.column_stack([edges[:-1], edges[1:]])
    with h5py.File(tmp_path / "legacy.hdf", "w") as f:
        dset = f.create_dataset("binning", data=pairs)
        dset.attrs["closed"] = "left"
    with h5py.File(tmp_path / "legacy.hdf") as f:
        binning = load_legacy_binning(f)
    assert_allclose(binning.edges, edges)
    assert str(binning.closed) == "left"
