import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu.randoms import BoxRandoms, HealPixRandoms
from yet_another_wizz_tpu.utils.healpix import (
    ang2pix_ring,
    npix_to_nside,
    nside_to_npix,
    pix2ang_ring,
)


class TestHealPixMath:
    def test_npix_roundtrip(self):
        for nside in (1, 2, 8, 64):
            assert npix_to_nside(nside_to_npix(nside)) == nside
        with pytest.raises(ValueError):
            npix_to_nside(100)

    @pytest.mark.parametrize("nside", [1, 4, 16])
    def test_pix2ang_ang2pix_consistent(self, nside):
        """A pixel's center must map back to the same pixel."""
        pix = np.arange(nside_to_npix(nside))
        theta, phi = pix2ang_ring(nside, pix)
        back = ang2pix_ring(nside, theta, phi)
        assert np.array_equal(back, pix)

    def test_all_pixels_covered_uniformly(self, rng):
        """Uniform sky points land in all pixels with equal frequency
        (HEALPix pixels are equal-area)."""
        nside = 4
        n = 200_000
        theta = np.arccos(rng.uniform(-1, 1, n))
        phi = rng.uniform(0, 2 * np.pi, n)
        pix = ang2pix_ring(nside, theta, phi)
        counts = np.bincount(pix, minlength=nside_to_npix(nside))
        expect = n / nside_to_npix(nside)
        assert np.all(counts > 0)
        assert np.abs(counts - expect).max() < 6 * np.sqrt(expect)

    def test_poles_and_equator(self):
        assert ang2pix_ring(2, [0.0], [0.1])[0] in (0, 1, 2, 3)
        npix = nside_to_npix(2)
        assert ang2pix_ring(2, [np.pi], [0.1])[0] >= npix - 4


class TestBoxRandoms:
    def test_footprint_and_uniformity(self):
        gen = BoxRandoms(20, 40, -10, 10, seed=1)
        chunk = gen(50_000)
        ra, dec = chunk["ra"], chunk["dec"]
        assert ra.min() >= np.deg2rad(20) and ra.max() <= np.deg2rad(40)
        assert dec.min() >= np.deg2rad(-10) and dec.max() <= np.deg2rad(10)
        # uniform in sin(dec)
        hist, _ = np.histogram(np.sin(dec), 10)
        assert hist.std() / hist.mean() < 0.05

    def test_reproducible_seed(self):
        a = BoxRandoms(0, 10, -5, 5, seed=7)(100)
        b = BoxRandoms(0, 10, -5, 5, seed=7)(100)
        assert np.array_equal(a["ra"], b["ra"])
        c = BoxRandoms(0, 10, -5, 5, seed=8)(100)
        assert not np.array_equal(a["ra"], c["ra"])

    def test_draws_attributes(self, rng):
        weights = rng.uniform(1, 2, 500)
        redshifts = rng.uniform(0, 1, 500)
        gen = BoxRandoms(
            0, 10, -5, 5, weights=weights, redshifts=redshifts, seed=1
        )
        chunk = gen(1000)
        assert gen.has_weights and gen.has_redshifts
        # weights and redshifts are drawn jointly (paired)
        lookup = {w: z for w, z in zip(weights, redshifts)}
        assert all(lookup[w] == z for w, z in zip(chunk["weights"][:50], chunk["redshifts"][:50]))

    def test_validation(self):
        with pytest.raises(ValueError, match="ra_min"):
            BoxRandoms(30, 10, -5, 5)
        with pytest.raises(ValueError, match="does not match"):
            BoxRandoms(0, 10, -5, 5, weights=np.ones(3), redshifts=np.ones(4))


class TestHealPixRandoms:
    def test_mask_respected(self):
        nside = 8
        mask = np.zeros(nside_to_npix(nside), dtype=bool)
        mask[100:150] = True
        gen = HealPixRandoms(mask, seed=1)
        chunk = gen(5000)
        pix = ang2pix_ring(
            nside, np.pi / 2 - chunk["dec"], chunk["ra"]
        )
        assert np.all((pix >= 100) & (pix < 150))

    def test_probability_map(self):
        nside = 4
        pmap = np.zeros(nside_to_npix(nside))
        pmap[10] = 1.0
        pmap[20] = 0.5
        gen = HealPixRandoms(pmap, seed=2)
        chunk = gen(30_000)
        pix = ang2pix_ring(nside, np.pi / 2 - chunk["dec"], chunk["ra"])
        counts = np.bincount(pix, minlength=len(pmap))
        assert set(np.nonzero(counts)[0]) == {10, 20}
        ratio = counts[20] / counts[10]
        assert 0.4 < ratio < 0.6

    def test_invalid_maps(self):
        with pytest.raises(ValueError, match="negative"):
            HealPixRandoms(np.full(12, -1.0))
        with pytest.raises(ValueError, match="no area"):
            HealPixRandoms(np.zeros(12))
        with pytest.raises(ValueError, match="healpix"):
            HealPixRandoms(np.ones(13))


class TestHealPixBoundingBox:
    def _map_for_box(self, nside, ra_lo, ra_hi, dec_lo, dec_hi):
        from yet_another_wizz_tpu.utils.healpix import pix2ang_ring

        colat, lon = pix2ang_ring(nside, np.arange(12 * nside * nside))
        ra = np.rad2deg(lon)
        dec = 90.0 - np.rad2deg(colat)
        if ra_lo <= ra_hi:
            in_ra = (ra >= ra_lo) & (ra <= ra_hi)
        else:  # wraps through RA = 0
            in_ra = (ra >= ra_lo) | (ra <= ra_hi)
        return (in_ra & (dec >= dec_lo) & (dec <= dec_hi)).astype(float)

    def test_small_footprint_efficiency(self):
        pm = self._map_for_box(32, 40, 60, -10, 10)
        gen = HealPixRandoms(pm, seed=3)
        assert gen._efficiency > 0.5  # box-bounded, not full-sphere
        data = gen(20_000)
        ra = np.rad2deg(data["ra"])
        assert ra.min() > 38 and ra.max() < 62

    def test_wraparound_footprint(self):
        pm = self._map_for_box(32, 350, 10, -5, 5)
        gen = HealPixRandoms(pm, seed=3)
        data = gen(20_000)
        ra = np.rad2deg(data["ra"])
        # all samples near RA=0 wrap, none in the excluded middle
        assert np.all((ra >= 348) | (ra <= 12))
        assert len(data) == 20_000


class TestPolarCapCoverage:
    """Regression: the rejection box must contain the FULL footprint of
    polar-cap pixels, whose longitude width (pi / (4 ring)) far exceeds
    the mean pixel size a center-padded box assumed."""

    def test_single_polar_pixel_fully_covered(self):
        nside = 64
        pm = np.zeros(12 * nside * nside)
        pm[0] = 1.0  # ring-1 pixel spanning lon [0, pi/2]
        gen = HealPixRandoms(pm, seed=1)
        data = gen(20_000)
        ra = data["ra"]
        # samples reach both longitude edges of the pixel
        assert ra.min() < 0.05 and ra.max() > np.pi / 2 - 0.05

    def test_pix_bounds_contain_members(self):
        from yet_another_wizz_tpu.utils.healpix import (
            ang2pix_ring,
            pix_bounds_ring,
        )

        rng = np.random.default_rng(11)
        for nside in (1, 4, 32):
            n = 50_000
            z = rng.uniform(-1, 1, n)
            phi = rng.uniform(0, 2 * np.pi, n)
            pix = ang2pix_ring(nside, np.arccos(z), phi)
            z_lo, z_hi, lon_lo, lon_hi = pix_bounds_ring(
                nside, np.arange(12 * nside * nside)
            )
            assert np.all(z >= z_lo[pix] - 1e-12)
            assert np.all(z <= z_hi[pix] + 1e-12)
            delta = np.mod(phi - lon_lo[pix], 2 * np.pi)
            assert np.all(delta <= lon_hi[pix] - lon_lo[pix] + 1e-9)


class TestReferenceParityAPI:
    """Reference members: get_data_size / data_size / generate_dataframe
    (/root/reference/src/yaw/randoms.py:58-185)."""

    def test_get_data_size(self, rng):
        gen = BoxRandoms(0.0, 10.0, -5.0, 5.0)
        assert gen.data_size == -1 and gen.get_data_size() == -1

        z = rng.uniform(0.1, 1.0, 100)
        gen = BoxRandoms(0.0, 10.0, -5.0, 5.0, redshifts=z)
        assert gen.data_size == 100

        w = rng.uniform(0.5, 2.0, 100)
        gen = BoxRandoms(0.0, 10.0, -5.0, 5.0, weights=w, redshifts=z)
        assert gen.get_data_size() == 100

        with pytest.raises(ValueError, match="does not match"):
            BoxRandoms(0.0, 10.0, -5.0, 5.0, weights=w[:50], redshifts=z)

    def test_generate_dataframe(self, rng):
        z = rng.uniform(0.1, 1.0, 64)
        gen = BoxRandoms(0.0, 10.0, -5.0, 5.0, redshifts=z, seed=3)
        df = gen.generate_dataframe(500)
        assert list(df.columns) == ["ra", "dec", "redshifts"]
        # degrees by default, inside the footprint
        assert df["ra"].min() >= 0.0 and df["ra"].max() <= 10.0
        assert df["dec"].min() >= -5.0 and df["dec"].max() <= 5.0

        gen.reseed(3)
        df_rad = gen.generate_dataframe(500, degrees=False)
        np.testing.assert_allclose(np.deg2rad(df["ra"]), df_rad["ra"])
