"""The committed mock example products: a fresh offline install must load
``examples.cross/auto/estimate`` from the in-package files without
computing anything (reference parity: the reference ships precomputed
2dFLenS products with the package,
/root/reference/src/yaw/examples/__init__.py:46-301)."""

import importlib

import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal

from yet_another_wizz_tpu.examples import _PACKAGE_PRODUCTS

pytestmark = pytest.mark.skipif(
    not (_PACKAGE_PRODUCTS / "cross.hdf").exists(),
    reason="packaged example products not built",
)


@pytest.fixture
def offline_examples(tmp_path, monkeypatch):
    """The examples module resolved against an empty cache with the mock
    forced — whatever loads must come from the committed files."""
    monkeypatch.setenv("YAWT_EXAMPLE_CACHE", str(tmp_path / "cache"))
    monkeypatch.setenv("YAWT_EXAMPLE_FORCE_MOCK", "1")
    import yet_another_wizz_tpu.examples as examples

    importlib.reload(examples)
    yield examples
    monkeypatch.undo()
    importlib.reload(examples)


def test_products_resolve_to_package_files(offline_examples):
    assert offline_examples.PATH.cross.parent == _PACKAGE_PRODUCTS
    assert offline_examples.PATH.auto.parent == _PACKAGE_PRODUCTS
    for name in ("estimate.dat", "estimate.smp", "estimate.cov"):
        assert (_PACKAGE_PRODUCTS / name).exists()


def test_committed_products_load_without_computation(offline_examples, tmp_path):
    cross = offline_examples.cross
    auto = offline_examples.auto
    estimate = offline_examples.estimate
    assert cross.dd.num_bins == 11
    assert auto.dd.num_bins == 11
    assert estimate.num_bins == 11
    assert np.all(np.isfinite(estimate.data))
    # nothing was measured into the cache: the load was file-only
    assert not (tmp_path / "cache" / "cross.hdf").exists()


def _golden_module():
    import importlib.util
    from pathlib import Path

    path = Path(__file__).parent / "test_golden_example.py"
    spec = importlib.util.spec_from_file_location("_golden_example", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_committed_estimate_matches_golden(offline_examples):
    golden = _golden_module()
    GOLDEN_DATA, GOLDEN_ERROR = golden.GOLDEN_DATA, golden.GOLDEN_ERROR

    estimate = offline_examples.estimate
    assert_array_almost_equal(estimate.data, GOLDEN_DATA, decimal=5)
    assert_array_almost_equal(estimate.error, GOLDEN_ERROR, decimal=5)


def test_committed_products_are_consistent(offline_examples):
    """estimate must equal what the committed cross/auto recombine to."""
    from yet_another_wizz_tpu.redshifts import RedshiftData

    recombined = RedshiftData.from_corrfuncs(
        offline_examples.cross, offline_examples.auto
    )
    # the committed estimate round-trips through the ASCII .dat format,
    # which stores ~6 significant decimals
    assert_array_almost_equal(
        recombined.data, offline_examples.estimate.data, decimal=5
    )
