"""Example API on the real 2dFLenS survey files.

When the prepared files are mounted (the reference package bundles them,
/root/reference/src/yaw/examples/), ``yet_another_wizz_tpu.examples`` must
serve them directly: committed parquet catalogs with the bundled patch
column, and the committed cross/auto/estimate products, all read through
this framework's two-way-compatible loaders.
"""

import importlib
from pathlib import Path

import numpy as np
import pytest
from numpy.testing import assert_allclose

REAL_DIR = Path("/root/reference/src/yaw/examples")

pytestmark = pytest.mark.skipif(
    not (REAL_DIR / "2dflens_kidss_data.pqt").exists(),
    reason="prepared 2dFLenS example files not available",
)


@pytest.fixture()
def examples(monkeypatch):
    monkeypatch.delenv("YAWT_EXAMPLE_FORCE_MOCK", raising=False)
    import yet_another_wizz_tpu.examples as examples

    examples = importlib.reload(examples)
    assert examples.USES_REAL_DATA
    yield examples
    # restore whatever state other tests expect
    importlib.reload(examples)


def test_paths_point_at_survey_files(examples):
    assert examples.PATH.data.name == "2dflens_kidss_data.pqt"
    assert examples.PATH.rand.name == "2dflens_kidss_rand_5x.pqt"
    assert examples.PATH.unknown == examples.PATH.data


def test_committed_products_load(examples):
    cross = examples.cross
    auto = examples.auto
    estimate = examples.estimate
    assert cross.num_patches == 11
    assert auto.num_patches == 11
    assert estimate.num_bins == 11
    assert np.all(np.isfinite(estimate.data))
    # reference-parity module attributes
    assert examples.normalised_counts is not None
    assert examples.patched_count.num_patches == 11
    assert examples.patched_sum_weights.num_patches == 11


def test_estimate_consistent_with_committed_corrfuncs(examples):
    """Recomputing the estimate from the committed cross/auto pair counts
    through this framework's resampling and estimator stack reproduces the
    committed estimate files."""
    from yet_another_wizz_tpu.redshifts import RedshiftData

    recomputed = RedshiftData.from_corrfuncs(examples.cross, examples.auto)
    committed = examples.estimate
    assert_allclose(recomputed.data, committed.data, rtol=1e-6)
    assert_allclose(recomputed.samples, committed.samples, rtol=1e-6)
    assert_allclose(recomputed.error, committed.error, rtol=1e-5)


def test_catalog_uses_bundled_patches(examples, tmp_path):
    data = examples.ExampleData.create_data_cat(tmp_path / "cache")
    assert data.num_patches == 11
    total = sum(p.meta.num_records for p in data.values())
    assert total == 21_875  # committed row count


def test_build_products_refuses_overwriting_committed(examples):
    examples.ExampleData.build_products()  # no-op
    with pytest.raises(RuntimeError, match="read-only"):
        examples.ExampleData.build_products(force=True)
