import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_almost_equal

from yet_another_wizz_tpu.coordinates import (
    AngularCoordinates,
    AngularDistances,
    angle_to_chord,
    chord_to_angle,
    radec_to_xyz,
    split_hi_lo,
    xyz_to_radec,
)


class TestConversionFunctions:
    def test_cardinal_directions(self):
        xyz = radec_to_xyz([0.0, np.pi / 2, np.pi, 3 * np.pi / 2], [0.0] * 4)
        expect = np.array([[1, 0, 0], [0, 1, 0], [-1, 0, 0], [0, -1, 0]])
        assert_array_almost_equal(xyz, expect)

    def test_poles(self):
        xyz = radec_to_xyz([0.3, 1.7], [np.pi / 2, -np.pi / 2])
        assert_array_almost_equal(xyz, [[0, 0, 1], [0, 0, -1]])

    def test_roundtrip_random(self, rng):
        ra = rng.uniform(0, 2 * np.pi, 1000)
        dec = np.arcsin(rng.uniform(-1, 1, 1000))
        ra2, dec2 = xyz_to_radec(radec_to_xyz(ra, dec))
        assert_allclose(ra2, ra, atol=1e-12)
        assert_allclose(dec2, dec, atol=1e-12)

    def test_ra_wraparound(self):
        ra, _ = xyz_to_radec(radec_to_xyz([2 * np.pi + 0.1, -0.1], [0.0, 0.0]))
        assert_allclose(ra, [0.1, 2 * np.pi - 0.1])

    def test_unnormalised_input(self):
        ra, dec = xyz_to_radec([[0.0, 0.0, 5.0]])
        assert_allclose(dec, [np.pi / 2])

    def test_chord_angle_roundtrip(self):
        angles = np.array([0.0, 1e-6, 0.01, 1.0, np.pi / 2, np.pi])
        assert_allclose(chord_to_angle(angle_to_chord(angles)), angles, atol=1e-12)
        assert_allclose(angle_to_chord(np.pi), 2.0)

    def test_split_hi_lo(self, rng):
        values = rng.uniform(-1, 1, 1000)
        hi, lo = split_hi_lo(values)
        assert hi.dtype == np.float32 and lo.dtype == np.float32
        combined = hi.astype(np.float64) + lo.astype(np.float64)
        assert_allclose(combined, values, rtol=1e-14, atol=1e-14)
        # lo really is a correction below float32 resolution
        assert np.abs(lo).max() < 1e-7


class TestAngularCoordinates:
    def test_shape_validation(self):
        with pytest.raises(ValueError):
            AngularCoordinates(np.zeros((3, 3)))

    def test_accessors_and_len(self):
        coords = AngularCoordinates([[0.1, 0.2], [0.3, 0.4]])
        assert len(coords) == 2
        assert_allclose(coords.ra, [0.1, 0.3])
        assert_allclose(coords.dec, [0.2, 0.4])

    def test_single_coord_promotion(self):
        coords = AngularCoordinates([0.1, 0.2])
        assert coords.data.shape == (1, 2)

    def test_indexing_and_concat(self):
        coords = AngularCoordinates([[0.1, 0.2], [0.3, 0.4], [0.5, 0.6]])
        sub = coords[1:]
        assert len(sub) == 2
        merged = AngularCoordinates.from_coords([coords[:1], sub])
        assert np.array_equal(merged.data, coords.data)

    def test_3d_roundtrip(self, rng):
        ra = rng.uniform(0, 2 * np.pi, 100)
        dec = np.arcsin(rng.uniform(-1, 1, 100))
        coords = AngularCoordinates(np.column_stack([ra, dec]))
        back = AngularCoordinates.from_3d(coords.to_3d())
        assert_allclose(back.data, coords.data, atol=1e-12)

    def test_mean_weighted(self):
        coords = AngularCoordinates([[0.0, 0.0], [0.2, 0.0]])
        assert_allclose(coords.mean().ra, [0.1], atol=1e-12)
        weighted = coords.mean(weights=[1.0, 0.0])
        assert_allclose(weighted.ra, [0.0], atol=1e-12)

    def test_distance(self):
        a = AngularCoordinates([[0.0, 0.0]])
        b = AngularCoordinates([[np.pi, 0.0]])
        assert_allclose(a.distance(b).data, [np.pi], atol=1e-12)
        with pytest.raises(TypeError):
            a.distance(np.zeros(2))

    def test_distance_small_angles(self):
        a = AngularCoordinates([[0.0, 0.0]])
        b = AngularCoordinates([[1e-5, 0.0]])
        assert_allclose(a.distance(b).data, [1e-5], rtol=1e-9)


class TestAngularDistances:
    def test_from_3d_validates(self):
        with pytest.raises(ValueError, match="unit sphere"):
            AngularDistances.from_3d([2.5])

    def test_3d_roundtrip(self):
        dists = AngularDistances([0.0, 0.5, np.pi])
        assert_allclose(AngularDistances.from_3d(dists.to_3d()).data, dists.data)

    def test_comparison_operators(self):
        a = AngularDistances([0.1, 0.5])
        b = AngularDistances([0.2, 0.4])
        assert np.array_equal(a < b, [True, False])
        assert np.array_equal(a >= b, [False, True])

    def test_arithmetic(self):
        a = AngularDistances([0.1])
        b = AngularDistances([0.2])
        assert_allclose((a + b).data, [0.3])
        assert_allclose((b - a).data, [0.1])

    def test_min_max_concat(self):
        d = AngularDistances.from_dists(
            [AngularDistances([0.3]), AngularDistances([0.1, 0.7])]
        )
        assert len(d) == 3
        assert_allclose(d.min().data, [0.1])
        assert_allclose(d.max().data, [0.7])


def test_sgn_convention():
    from yet_another_wizz_tpu.coordinates import sgn

    assert_allclose(sgn([-2.0, -0.0, 0.0, 3.0]), [-1.0, 1.0, 1.0, 1.0])
