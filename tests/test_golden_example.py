"""Golden-output regression: the example pipeline must reproduce committed
n(z) values.

This is the analogue of the reference's numerical north star
(/root/reference/tests/test_setups.py:149-168, which pins the 2dFLenS
example products): the deterministic mock example, measured with the
portable XLA engine on CPU, must keep producing exactly these numbers.
Any change to the kernel math, the estimator algebra, the mock generator
or the cosmology shows up here.
"""

import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal

GOLDEN_DATA = [
    16.033076, 19.480935, 40.183256, 54.050943, 29.250924, 30.301748,
    28.698718, 27.726786, 32.744605, 27.515503, 31.950818,
]
GOLDEN_ERROR = [
    2.5437772108, 2.4492867423, 15.1469281828, 34.6318231052,
    6.0442348964, 5.9222882884, 4.7280745403, 2.7285540458,
    4.9976869546, 3.0939532248, 4.6525200547,
]
GOLDEN_SAMPLE_0 = [
    15.732515, 19.859813, 40.758905, 56.077698, 29.963862, 30.6508,
    28.644714, 28.546736, 33.591598, 27.386832, 31.985589,
]


@pytest.mark.slow
def test_example_estimate_reproduces_golden_values(tmp_path, monkeypatch):
    monkeypatch.setenv("YAWT_EXAMPLE_CACHE", str(tmp_path / "examples"))
    # the golden numbers pin the deterministic mock, not the survey data
    monkeypatch.setenv("YAWT_EXAMPLE_FORCE_MOCK", "1")
    # reload so PATH picks up the isolated cache location
    import importlib

    import yet_another_wizz_tpu.examples as examples

    importlib.reload(examples)
    estimate = examples.estimate

    assert estimate.num_bins == 11
    assert estimate.num_samples == 11
    assert_array_almost_equal(estimate.data, GOLDEN_DATA, decimal=5)
    assert_array_almost_equal(estimate.error, GOLDEN_ERROR, decimal=5)
    assert_array_almost_equal(estimate.samples[0], GOLDEN_SAMPLE_0, decimal=5)
