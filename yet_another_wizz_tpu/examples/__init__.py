"""Bundled example / mock data for tests, benchmarks and documentation.

The reference ships a prepared 2dFLenS galaxy sample with precomputed
correlation products (/root/reference/src/yaw/examples/__init__.py:46-301,
downloaded at build time). This environment has no network access, so the
example data is generated deterministically instead: a mock survey with
genuine clustering signal, built by scattering galaxies around common
"cluster" positions so that reference and unknown samples trace the same
large-scale structure and the recovered n(z) is meaningful.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

from yet_another_wizz_tpu.coordinates import radec_to_xyz, xyz_to_radec
from yet_another_wizz_tpu.cosmology import get_default_cosmology

if TYPE_CHECKING:
    from numpy.typing import NDArray

__all__ = [
    "ExampleData",
    "PATH",
    "config",
    "generate_mock_data",
]

DEFAULT_REGION = (40.0, 60.0, -10.0, 10.0)  # ra_min, ra_max, dec_min, dec_max
DEFAULT_Z_RANGE = (0.15, 1.0)


def _uniform_sky(rng, n, region):
    ra_min, ra_max, dec_min, dec_max = np.deg2rad(np.asarray(region, float))
    ra = rng.uniform(ra_min, ra_max, n)
    sin_dec = rng.uniform(np.sin(dec_min), np.sin(dec_max), n)
    return ra, np.arcsin(sin_dec)


def _scatter_on_sky(rng, centers_xyz, sigma_rad):
    """Displace unit vectors by Gaussian angular offsets."""
    n = len(centers_xyz)
    # local tangent-plane offsets
    offsets = rng.normal(0.0, 1.0, (n, 2)) * sigma_rad[:, None]
    # build tangent bases
    z_axis = np.array([0.0, 0.0, 1.0])
    east = np.cross(z_axis, centers_xyz)
    east /= np.maximum(np.linalg.norm(east, axis=1, keepdims=True), 1e-12)
    north = np.cross(centers_xyz, east)
    displaced = (
        centers_xyz + offsets[:, :1] * east + offsets[:, 1:] * north
    )
    return displaced / np.linalg.norm(displaced, axis=1, keepdims=True)


def generate_mock_data(
    num_reference: int = 20_000,
    num_unknown: int = 50_000,
    num_randoms: int = 100_000,
    *,
    num_clusters: int = 800,
    cluster_fraction: float = 0.65,
    cluster_sigma_kpc: float = 450.0,
    redshift_sigma: float = 0.015,
    region: tuple[float, float, float, float] = DEFAULT_REGION,
    z_range: tuple[float, float] = DEFAULT_Z_RANGE,
    weighted: bool = True,
    seed: int = 12345,
) -> dict[str, dict[str, NDArray]]:
    """Generate a deterministic mock survey with clustering signal.

    Galaxies of both samples are placed around shared cluster positions
    (physical scatter ``cluster_sigma_kpc`` converted to an angle at the
    cluster redshift) with the remainder uniform on the sky, producing
    positive cross- and autocorrelation amplitudes at ~Mpc scales.

    Returns a dictionary with keys ``reference``, ``unknown``, ``randoms``;
    each value holds ``ra``/``dec`` (radian) plus ``redshifts`` and
    (optionally) ``weights`` arrays.
    """
    rng = np.random.default_rng(seed)
    cosmology = get_default_cosmology()
    z_lo, z_hi = z_range

    # shared large-scale structure
    cluster_ra, cluster_dec = _uniform_sky(rng, num_clusters, region)
    cluster_xyz = radec_to_xyz(cluster_ra, cluster_dec)
    cluster_z = rng.uniform(z_lo, z_hi, num_clusters)
    richness = rng.pareto(2.5, num_clusters) + 1.0
    cluster_prob = richness / richness.sum()
    # angular scatter of members at the cluster redshift
    ang_diam = cosmology.angular_diameter_distance(cluster_z)
    cluster_sigma = (cluster_sigma_kpc / 1000.0) / np.asarray(ang_diam)

    def make_sample(n):
        num_clustered = int(n * cluster_fraction)
        members = rng.choice(num_clusters, num_clustered, p=cluster_prob)
        xyz = _scatter_on_sky(
            rng, cluster_xyz[members], cluster_sigma[members]
        )
        z_clustered = np.clip(
            cluster_z[members] + rng.normal(0, redshift_sigma, num_clustered),
            z_lo, z_hi,
        )
        ra_field, dec_field = _uniform_sky(rng, n - num_clustered, region)
        ra_cl, dec_cl = xyz_to_radec(xyz)
        ra = np.concatenate([ra_cl, ra_field])
        dec = np.concatenate([dec_cl, dec_field])
        redshifts = np.concatenate(
            [z_clustered, rng.uniform(z_lo, z_hi, n - num_clustered)]
        )
        order = rng.permutation(n)
        sample = dict(ra=ra[order], dec=dec[order], redshifts=redshifts[order])
        if weighted:
            sample["weights"] = rng.uniform(0.5, 2.0, n)
        return sample

    reference = make_sample(num_reference)
    unknown = make_sample(num_unknown)

    rand_ra, rand_dec = _uniform_sky(rng, num_randoms, region)
    randoms = dict(
        ra=rand_ra,
        dec=rand_dec,
        redshifts=rng.choice(reference["redshifts"], num_randoms, replace=True),
    )
    if weighted:
        randoms["weights"] = np.ones(num_randoms)

    return dict(reference=reference, unknown=unknown, randoms=randoms)


# -- reference-style example accessors ---------------------------------------

import os as _os
from pathlib import Path as _Path


class PATH:
    """Paths of the generated example data products (materialised on demand
    by :class:`ExampleData`; the reference downloads prepared 2dFLenS files
    here instead, which is impossible without network access)."""

    root = _Path(
        _os.environ.get("YAWT_EXAMPLE_CACHE", "/tmp/yawt_examples")
    )
    data = root / "mock_data.pqt"
    rand = root / "mock_rand.pqt"
    unknown = root / "mock_unknown.pqt"
    cross = root / "cross.hdf"
    auto = root / "auto.hdf"
    estimate = root / "estimate"


def _example_configuration():
    from yet_another_wizz_tpu.config import Configuration

    return Configuration.create(
        rmin=100, rmax=1000, unit="kpc",
        zmin=0.15, zmax=0.7, num_bins=11,
    )


# note: `config`, `cross`, `auto` and `estimate` are module attributes
# resolved lazily in __getattr__ below


class ExampleData:
    """Create the example catalogs and precomputed correlation products.

    Mirrors the reference's ``yaw.examples.ExampleData``
    (/root/reference/src/yaw/examples/__init__.py:94-301) with generated
    mock data instead of the downloaded 2dFLenS sample.
    """

    NUM_PATCHES = 11

    @classmethod
    def ensure_files(cls) -> None:
        """Materialise the example parquet files (idempotent)."""
        if PATH.data.exists() and PATH.rand.exists():
            return
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        PATH.root.mkdir(parents=True, exist_ok=True)
        mock = generate_mock_data(
            num_reference=15_000, num_unknown=25_000, num_randoms=60_000,
            seed=12345,
        )
        for name, target in (
            ("reference", PATH.data),
            ("randoms", PATH.rand),
            ("unknown", PATH.unknown),
        ):
            sample = mock[name]
            pq.write_table(
                pa.table(
                    dict(
                        RA=np.rad2deg(sample["ra"]),
                        Dec=np.rad2deg(sample["dec"]),
                        redshift=sample["redshifts"],
                        wei=sample["weights"],
                    )
                ),
                target,
            )

    @classmethod
    def _catalog(cls, cache_directory, path, **kwargs):
        from yet_another_wizz_tpu.catalog import Catalog

        cls.ensure_files()
        return Catalog.from_file(
            cache_directory, path,
            ra_name="RA", dec_name="Dec", redshift_name="redshift",
            weight_name="wei", overwrite=True, **kwargs,
        )

    @classmethod
    def create_data_cat(cls, cache_directory=None, **kwargs):
        """The example reference data catalog."""
        return cls._catalog(
            cache_directory, PATH.data, patch_num=cls.NUM_PATCHES, **kwargs
        )

    @classmethod
    def create_rand_cat(cls, cache_directory=None, patch_centers=None, **kwargs):
        """The example random catalog."""
        patch_args = (
            dict(patch_centers=patch_centers)
            if patch_centers is not None
            else dict(patch_num=cls.NUM_PATCHES)
        )
        return cls._catalog(
            cache_directory, PATH.rand, **patch_args, **kwargs
        )

    @classmethod
    def create_unknown_cat(cls, cache_directory=None, patch_centers=None, **kwargs):
        """The example unknown-sample catalog."""
        patch_args = (
            dict(patch_centers=patch_centers)
            if patch_centers is not None
            else dict(patch_num=cls.NUM_PATCHES)
        )
        return cls._catalog(
            cache_directory, PATH.unknown, **patch_args, **kwargs
        )

    @classmethod
    def build_products(cls, force: bool = False) -> None:
        """Compute and store the example correlation products
        (``cross.hdf``, ``auto.hdf``, ``estimate.{dat,smp,cov}``)."""
        if not force and PATH.cross.exists() and PATH.auto.exists():
            return
        from yet_another_wizz_tpu.correlation.measurements import (
            autocorrelate,
            crosscorrelate,
        )
        from yet_another_wizz_tpu.redshifts import RedshiftData

        cfg = _example_configuration()
        data = cls.create_data_cat()
        rand = cls.create_rand_cat(patch_centers=data.get_centers())
        unknown = cls.create_unknown_cat(patch_centers=data.get_centers())

        (cross_corr,) = crosscorrelate(cfg, data, unknown, ref_rand=rand)
        cross_corr.to_file(PATH.cross)
        (auto_corr,) = autocorrelate(cfg, data, rand)
        auto_corr.to_file(PATH.auto)
        RedshiftData.from_corrfuncs(cross_corr, auto_corr).to_files(
            PATH.estimate
        )


def __getattr__(name):
    # lazily computed example products, mirroring the reference's
    # module-level `cross`, `auto` and `estimate` attributes
    if name == "config":
        return _example_configuration()
    if name in ("cross", "auto"):
        from yet_another_wizz_tpu.correlation import load_corrfunc

        ExampleData.build_products()
        return load_corrfunc(getattr(PATH, name))
    if name == "estimate":
        from yet_another_wizz_tpu.redshifts import RedshiftData

        ExampleData.build_products()
        return RedshiftData.from_files(PATH.estimate)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
