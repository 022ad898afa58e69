"""Unit tests for the estimator models, in particular the empty-bin guard.

The reference divides by RR unguarded (/root/reference/src/yaw/correlation/
corrfunc.py:81-88), so empty random bins silently become inf in downstream
covariances. This framework masks them to NaN with a logged warning instead.
"""

import logging
import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu.models.estimators import (
    EstimatorError,
    davis_peebles,
    get_estimator,
    landy_szalay,
    scalar_correlation,
)


class TestLandySzalay:
    def test_basic(self):
        dd = np.array([4.0, 2.0])
        dr = np.array([2.0, 1.0])
        rr = np.array([1.0, 1.0])
        assert_allclose(landy_szalay(dd=dd, dr=dr, rr=rr), [1.0, 1.0])

    def test_rd_defaults_to_dr(self):
        dd = np.array([4.0])
        dr = np.array([2.0])
        rr = np.array([2.0])
        with_rd = landy_szalay(dd=dd, dr=dr, rd=dr, rr=rr)
        without = landy_szalay(dd=dd, dr=dr, rr=rr)
        assert_allclose(with_rd, without)

    def test_empty_rr_bin_masked_to_nan(self, caplog):
        dd = np.array([4.0, 2.0, 3.0])
        dr = np.array([2.0, 1.0, 1.0])
        rr = np.array([1.0, 0.0, 1.0])
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # no RuntimeWarning may escape
            with caplog.at_level(logging.WARNING):
                result = landy_szalay(dd=dd, dr=dr, rr=rr)
        assert np.isnan(result[1])
        assert np.isfinite(result[[0, 2]]).all()
        assert any("RR=0" in rec.message for rec in caplog.records)

    def test_all_zero_rr(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            result = landy_szalay(
                dd=np.ones(3), dr=np.ones(3), rr=np.zeros(3)
            )
        assert np.isnan(result).all()


class TestDavisPeebles:
    def test_basic(self):
        assert_allclose(
            davis_peebles(dd=np.array([3.0]), dr=np.array([1.0])), [2.0]
        )

    def test_requires_mixed_term(self):
        with pytest.raises(EstimatorError, match="dr.*rd"):
            davis_peebles(dd=np.ones(2))

    def test_empty_dr_bin_masked_to_nan(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            result = davis_peebles(
                dd=np.array([3.0, 1.0]), dr=np.array([0.0, 1.0])
            )
        assert np.isnan(result[0]) and np.isfinite(result[1])


class TestScalarCorrelation:
    def test_passthrough_and_subtraction(self):
        dd = np.array([1.5, 2.5])
        assert_allclose(scalar_correlation(dd=dd), dd)
        assert_allclose(scalar_correlation(dd=dd, dr=np.ones(2)), dd - 1.0)


def test_registry_lookup_case_insensitive():
    assert get_estimator("ls") is landy_szalay
    with pytest.raises(ValueError, match="unknown estimator"):
        get_estimator("nope")
