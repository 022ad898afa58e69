"""Property-based tests (hypothesis) for the core numerical invariants."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays
from numpy.testing import assert_allclose

from yet_another_wizz_tpu.binning import Binning
from yet_another_wizz_tpu.coordinates import (
    angle_to_chord,
    chord_to_angle,
    radec_to_xyz,
    split_hi_lo,
    xyz_to_radec,
)

finite_ra = st.floats(0.0, 2.0 * np.pi - 1e-9)
finite_dec = st.floats(-np.pi / 2 + 1e-9, np.pi / 2 - 1e-9)


@given(ra=finite_ra, dec=finite_dec)
def test_radec_xyz_roundtrip(ra, dec):
    xyz = radec_to_xyz([ra], [dec])
    assert_allclose(np.linalg.norm(xyz), 1.0, rtol=1e-14)
    ra2, dec2 = xyz_to_radec(xyz)
    assert_allclose(dec2[0], dec, atol=1e-12)
    # RA undefined at the poles
    if abs(dec) < np.pi / 2 - 1e-6:
        assert_allclose(ra2[0] % (2 * np.pi), ra % (2 * np.pi), atol=1e-9)


@given(angle=st.floats(1e-12, np.pi))
def test_chord_angle_roundtrip(angle):
    chord = angle_to_chord(angle)
    assert 0.0 < chord <= 2.0
    assert_allclose(chord_to_angle(chord), angle, rtol=1e-12)


@given(angles=st.lists(st.floats(0.0, np.pi), min_size=2, max_size=6))
def test_chord_is_monotonic(angles):
    ordered = np.sort(angles)
    chords = angle_to_chord(ordered)
    assert np.all(np.diff(chords) >= -1e-15)


@given(value=st.floats(-2.0, 2.0, allow_subnormal=False))
def test_hi_lo_split_exact(value):
    hi, lo = split_hi_lo(np.array([value]))
    # hi is exactly float32; the float64 sum restores ~47 bits
    assert np.float32(hi[0]) == hi[0]
    restored = np.float64(hi[0]) + np.float64(lo[0])
    assert_allclose(restored, value, rtol=1e-13, atol=1e-16)


@given(
    edges=st.lists(
        st.floats(0.01, 3.0), min_size=3, max_size=8, unique=True
    ),
    values=arrays(
        np.float64, st.integers(1, 40), elements=st.floats(0.0, 3.2)
    ),
    closed=st.sampled_from(["left", "right"]),
)
def test_binning_digitize_counts_everything_in_range(edges, values, closed):
    binning = Binning(np.sort(edges), closed=closed)
    ids = binning.digitize(values)  # numpy.digitize semantics: 1-based
    lo, hi = binning.edges[0], binning.edges[-1]
    if closed == "right":
        inside = (values > lo) & (values <= hi)
    else:
        inside = (values >= lo) & (values < hi)
    valid = (ids >= 1) & (ids <= len(binning))
    assert np.array_equal(valid, inside)


@given(
    counts=arrays(
        np.float64, (3, 5, 5), elements=st.floats(0.0, 100.0)
    ),
)
@settings(max_examples=30)
def test_jackknife_einsum_equals_naive(counts):
    """The einsum leave-one-out trick must equal explicitly deleting
    patch k's row and column."""
    from yet_another_wizz_tpu.correlation.paircounts import PatchedCounts

    binning = Binning(np.linspace(0.1, 0.7, 4))
    patched = PatchedCounts(binning, counts, auto=False)
    sampled = patched.sample_patch_sum("jackknife")
    num_patches = counts.shape[1]
    for k in range(num_patches):
        kept = np.delete(np.arange(num_patches), k)
        naive = counts[:, kept][:, :, kept].sum(axis=(1, 2))
        assert_allclose(sampled.samples[k], naive, rtol=1e-12, atol=1e-9)
