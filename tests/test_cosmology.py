import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu.binning import Binning
from yet_another_wizz_tpu.cosmology import (
    CustomCosmology,
    FLRWCosmology,
    Planck15,
    RedshiftBinningFactory,
    cosmology_is_equal,
    get_default_cosmology,
    new_scales,
)


class ToyCosmology(CustomCosmology):
    def comoving_distance(self, z):
        return 1000.0 * np.asarray(z)

    def angular_diameter_distance(self, z):
        return 1000.0 * np.asarray(z) / (1.0 + np.asarray(z))


class FakeQuantity:
    """Minimal astropy ``Quantity`` stand-in: value + unit attributes and
    arithmetic that keeps the wrapper, like ``Quantity`` does."""

    def __init__(self, value, unit="Mpc"):
        self.value = np.asarray(value, dtype=np.float64)
        self.unit = unit

    def __sub__(self, other):
        other = other.value if isinstance(other, FakeQuantity) else other
        return FakeQuantity(self.value - other, self.unit)


class FakeAstropyCosmology:
    """Duck-typed astropy-like cosmology: NOT a ``CustomCosmology`` subclass,
    distances come back wrapped in Quantity-like objects (astropy interop per
    /root/reference/src/yaw/cosmology.py:38-104, which accepts ``astropy.
    cosmology.FLRW`` instances directly)."""

    name = "FakeAstropy"

    def comoving_distance(self, z):
        return FakeQuantity(2000.0 * np.asarray(z, dtype=np.float64))

    def angular_diameter_distance(self, z):
        z = np.asarray(z, dtype=np.float64)
        return FakeQuantity(2000.0 * z / (1.0 + z))


class TestFLRWCosmology:
    def test_default_is_planck15(self):
        cosmo = get_default_cosmology()
        assert cosmo is Planck15
        assert cosmo.H0 == 67.74 and cosmo.Om0 == 0.3089

    def test_efunc_today(self):
        assert_allclose(Planck15.efunc(0.0), 1.0, rtol=1e-12)

    def test_comoving_distance_vs_quadrature(self):
        from scipy import integrate

        for z in [0.05, 0.4, 1.3, 4.0]:
            ref, _ = integrate.quad(
                Planck15.inv_efunc, 0, z, epsabs=1e-13, epsrel=1e-13
            )
            assert_allclose(
                Planck15.comoving_distance(z),
                Planck15.hubble_distance * ref,
                rtol=1e-10,
            )

    def test_distance_regression(self):
        # regression values computed with this implementation (agreeing with
        # astropy's Planck15 to <0.1%; astropy itself is unavailable here)
        assert_allclose(Planck15.comoving_distance(1.0), 3393.1329, rtol=1e-5)
        assert_allclose(
            Planck15.angular_diameter_distance(0.5), 1296.4179, rtol=1e-5
        )

    def test_vectorised(self):
        z = np.array([0.1, 0.5, 2.0])
        dists = Planck15.comoving_distance(z)
        assert dists.shape == (3,)
        assert np.all(np.diff(dists) > 0)

    def test_inversion(self):
        z = np.array([0.2, 0.9, 3.0])
        back = Planck15.redshift_at_comoving_distance(
            Planck15.comoving_distance(z)
        )
        assert_allclose(back, z, rtol=1e-9)

    def test_matter_only_analytic(self):
        # Einstein-de-Sitter: DC = 2 c/H0 (1 - 1/sqrt(1+z))
        eds = FLRWCosmology(H0=70.0, Om0=1.0, Ode0=0.0)
        z = np.array([0.5, 1.0, 3.0])
        expect = 2 * eds.hubble_distance * (1 - 1 / np.sqrt(1 + z))
        assert_allclose(eds.comoving_distance(z), expect, rtol=1e-10)

    def test_curvature_transverse(self):
        open_cosmo = FLRWCosmology(H0=70.0, Om0=0.3, Ode0=0.5)
        assert open_cosmo.Ok0 > 0
        dm = open_cosmo.comoving_transverse_distance(1.0)
        dc = open_cosmo.comoving_distance(1.0)
        assert dm > dc  # sinh expansion

    def test_neutrino_species_validation(self):
        """The mass vector must name all floor(Neff) species or none
        (astropy convention); partial vectors would silently invent
        phantom massless species and shift every distance."""
        with pytest.raises(ValueError, match="neutrino masses"):
            FLRWCosmology(
                H0=70, Om0=0.3, Tcmb0=2.7255, Neff=3.046, m_nu=(0.06,)
            )
        full = FLRWCosmology(
            H0=70, Om0=0.3, Tcmb0=2.7255, Neff=3.046, m_nu=(0, 0, 0.06)
        )
        none = FLRWCosmology(H0=70, Om0=0.3, Tcmb0=2.7255, Neff=3.046)
        d_full = full.comoving_distance(1.0)
        d_none = none.comoving_distance(1.0)
        assert np.isfinite(d_full) and np.isfinite(d_none)
        assert d_full != d_none  # the massive species changes Ode0
        # fractional Neff < 1 has no species to carry a mass vector
        with pytest.raises(ValueError, match="no neutrino species"):
            FLRWCosmology(
                H0=70, Om0=0.3, Tcmb0=2.7255, Neff=0.5, m_nu=(0.06,)
            )

    def test_fractional_neff_relativistic_density(self):
        """Massless neutrinos carry the FULL Neff in the radiation
        density — including fractional Neff in (0, 1), where the
        massive-species count floor(Neff) is zero."""
        lo = FLRWCosmology(H0=70, Om0=0.3, Tcmb0=2.7255, Neff=0.5)
        zero = FLRWCosmology(H0=70, Om0=0.3, Tcmb0=2.7255, Neff=0.0)
        one = FLRWCosmology(H0=70, Om0=0.3, Tcmb0=2.7255, Neff=1.0)
        d_lo = lo._nu_density_per_gamma(0.0)
        assert d_lo > 0.0
        assert_allclose(d_lo, one._nu_density_per_gamma(0.0) * 0.5)
        assert zero._nu_density_per_gamma(0.0) == 0.0

    def test_equality(self):
        clone = FLRWCosmology(
            H0=67.74, Om0=0.3089, Tcmb0=2.7255, Neff=3.046, m_nu=(0, 0, 0.06)
        )
        assert cosmology_is_equal(Planck15, clone)
        assert not cosmology_is_equal(Planck15, FLRWCosmology(H0=70, Om0=0.3))
        assert cosmology_is_equal(ToyCosmology(), ToyCosmology())
        assert not cosmology_is_equal(Planck15, ToyCosmology())
        with pytest.raises(TypeError):
            cosmology_is_equal(Planck15, "not a cosmology")


class TestScales:
    def test_angular_units(self):
        for unit, factor in [
            ("rad", 1.0),
            ("deg", np.pi / 180),
            ("arcmin", np.pi / 180 / 60),
            ("arcsec", np.pi / 180 / 3600),
        ]:
            scales = new_scales(1.0, 2.0, unit=unit)
            lo, hi = scales.get_angle_radian(0.5)
            assert_allclose(lo, [factor])
            assert_allclose(hi, [2 * factor])

    def test_physical_kpc(self):
        scales = new_scales(100, 1000, unit="kpc")
        lo, hi = scales.get_angle_radian(0.5, cosmology=Planck15)
        da = Planck15.angular_diameter_distance(0.5)
        assert_allclose(lo, [0.1 / da])
        assert_allclose(hi, [1.0 / da])

    def test_physical_mpc_consistent(self):
        kpc = new_scales(100, 1000, unit="kpc")
        mpc = new_scales(0.1, 1.0, unit="Mpc")
        assert_allclose(
            kpc.get_angle_radian(0.3), mpc.get_angle_radian(0.3)
        )

    def test_comoving(self):
        scales = new_scales(1.0, 10.0, unit="Mpc/h")
        lo, hi = scales.get_angle_radian(0.5, cosmology=Planck15)
        dc = Planck15.comoving_distance(0.5)
        assert_allclose(lo, [1.0 / dc])
        assert_allclose(hi, [10.0 / dc])

    def test_multi_scale(self):
        scales = new_scales([100, 500], [500, 1500], unit="kpc")
        assert scales.num_scales == 2
        lo, hi = scales.get_angle_radian(0.5)
        assert lo.shape == (2,)

    def test_validation(self):
        with pytest.raises(ValueError):
            new_scales(100, 100, unit="kpc")
        with pytest.raises(ValueError):
            new_scales([10, 20], [30], unit="kpc")
        with pytest.raises(ValueError):
            new_scales(1, 2, unit="parsecs")

    def test_custom_cosmology(self):
        scales = new_scales(1.0, 2.0, unit="Mpc")
        lo, hi = scales.get_angle_radian(1.0, cosmology=ToyCosmology())
        assert_allclose(lo, [1.0 / 500.0])


class TestAstropyDuckTyping:
    """An astropy-like cosmology (Quantity-returning, not a CustomCosmology
    subclass) must work everywhere a cosmology is accepted."""

    def test_physical_scales_unwrap_quantity(self):
        scales = new_scales(1.0, 2.0, unit="Mpc")
        lo, hi = scales.get_angle_radian(1.0, cosmology=FakeAstropyCosmology())
        # D_A(1.0) = 1000 Mpc for the fake model
        assert_allclose(lo, [1.0 / 1000.0])
        assert_allclose(hi, [2.0 / 1000.0])

    def test_comoving_scales_unwrap_quantity(self):
        scales = new_scales(2.0, 20.0, unit="Mpc")
        # comoving unit variant
        comoving = new_scales(2.0, 20.0, unit="Mpc/h")
        del scales
        lo, hi = comoving.get_angle_radian(
            0.5, cosmology=FakeAstropyCosmology()
        )
        assert np.all(np.isfinite(lo)) and np.all(hi > lo)

    def test_binning_factory_generic_inversion(self):
        factory = RedshiftBinningFactory(FakeAstropyCosmology())
        binning = factory.comoving(0.1, 1.1, 8)
        assert_allclose(binning.edges[[0, -1]], [0.1, 1.1])
        # d(z) is linear in the fake model, so comoving binning == linear
        assert_allclose(binning.edges, np.linspace(0.1, 1.1, 9), rtol=1e-8)

    def test_equality_convention(self):
        assert cosmology_is_equal(
            FakeAstropyCosmology(), FakeAstropyCosmology()
        )
        assert not cosmology_is_equal(Planck15, FakeAstropyCosmology())

    def test_configuration_accepts_duck_typed(self):
        from yet_another_wizz_tpu.config import Configuration

        config = Configuration.create(
            rmin=500, rmax=1500, zmin=0.1, zmax=1.0, num_bins=4,
            cosmology=FakeAstropyCosmology(),
        )
        assert isinstance(config.cosmology, FakeAstropyCosmology)
        lo, hi = config.scales.scales.get_angle_radian(
            0.5, cosmology=config.cosmology
        )
        assert np.all(np.isfinite(lo))


class TestRedshiftBinningFactory:
    def test_linear(self):
        binning = RedshiftBinningFactory().linear(0.1, 1.1, 10)
        assert_allclose(binning.edges, np.linspace(0.1, 1.1, 11))

    def test_comoving(self):
        binning = RedshiftBinningFactory().comoving(0.1, 1.1, 10)
        assert isinstance(binning, Binning)
        assert_allclose(binning.edges[[0, -1]], [0.1, 1.1])
        dists = Planck15.comoving_distance(binning.edges)
        assert_allclose(np.diff(dists), np.diff(dists)[0], rtol=1e-6)

    def test_logspace(self):
        binning = RedshiftBinningFactory().logspace(0.1, 1.1, 10)
        log_edges = np.log1p(binning.edges)
        assert_allclose(np.diff(log_edges), np.diff(log_edges)[0], rtol=1e-10)

    def test_get_method(self):
        factory = RedshiftBinningFactory()
        assert factory.get_method("linear") == factory.linear
        with pytest.raises(ValueError):
            factory.get_method("nope")
