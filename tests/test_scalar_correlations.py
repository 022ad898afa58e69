"""Scalar-field (kappa) correlation measurements against the float64
oracle path, covering the kn/kk counting modes."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from yet_another_wizz_tpu import Catalog, Configuration
from yet_another_wizz_tpu.correlation.corrfunc import ScalarCorrFunc
from yet_another_wizz_tpu.correlation.measurements import (
    PatchLinkage,
    autocorrelate_scalar,
    crosscorrelate_scalar,
)
from yet_another_wizz_tpu.examples import generate_mock_data


@pytest.fixture(scope="module")
def catalogs():
    mock = generate_mock_data(
        num_reference=3000, num_unknown=5000, num_randoms=6000, seed=11
    )
    rng = np.random.default_rng(5)
    ref_data = dict(mock["reference"])
    ref_data["kappa"] = rng.normal(0.1, 0.3, len(ref_data["ra"]))
    unk_data = dict(mock["unknown"])
    unk_data["kappa"] = rng.normal(0.05, 0.2, len(unk_data["ra"]))

    reference = Catalog.from_arrays(**ref_data, degrees=False, patch_num=4)
    centers = reference.get_centers()
    unknown = Catalog.from_arrays(
        **unk_data, degrees=False, patch_centers=centers
    )
    randoms = Catalog.from_arrays(
        **mock["randoms"], degrees=False, patch_centers=centers
    )
    return reference, unknown, randoms


@pytest.fixture(scope="module")
def config():
    return Configuration.create(
        rmin=500, rmax=3000, unit="kpc", zmin=0.15, zmax=1.0, num_bins=4
    )


class TestScalarModes:
    def test_kn_counts_match_oracle(self, catalogs, config):
        reference, unknown, _ = catalogs
        links = PatchLinkage.from_catalogs(config, reference, unknown)
        engine = links.count_pairs(
            reference, unknown, mode="kn", backend="xla"
        )
        oracle = links.count_pairs(
            reference, unknown, mode="kn", backend="oracle"
        )
        assert_allclose(
            engine[0].counts.counts, oracle[0].counts.counts,
            rtol=1e-4, atol=1.0,
        )

    def test_kk_counts_match_oracle(self, catalogs, config):
        reference, unknown, _ = catalogs
        links = PatchLinkage.from_catalogs(config, reference, unknown)
        engine = links.count_pairs(
            reference, unknown, mode="kk", backend="xla"
        )
        oracle = links.count_pairs(
            reference, unknown, mode="kk", backend="oracle"
        )
        assert_allclose(
            engine[0].counts.counts, oracle[0].counts.counts,
            rtol=1e-4, atol=1.0,
        )

    def test_kn_weights_are_kappa_times_weights(self, catalogs, config):
        """The kn mode pair weight on the kappa side is kappa * weight."""
        reference, unknown, _ = catalogs
        binning = config.binning.binning
        tiles_k = reference.get_tiles(binning, mode="k")
        tiles_n = reference.get_tiles(binning, mode="n")
        total_k = tiles_k.lane_data[:, 6, :].astype(np.float64).sum()
        expect = np.sum(
            reference.kappa * reference.weights, where=np.isin(
                binning.digitize(reference.redshifts) - 1,
                np.arange(len(binning)),
            )
        )
        assert_allclose(total_k, expect, rtol=1e-4)
        assert not np.allclose(
            tiles_k.lane_data[:, 6, :], tiles_n.lane_data[:, 6, :]
        )


class TestScalarCorrelationFunctions:
    def test_autocorrelate_scalar(self, catalogs, config):
        reference, _, _ = catalogs
        (corr,) = autocorrelate_scalar(config, reference)
        assert isinstance(corr, ScalarCorrFunc)
        data = corr.sample()
        assert np.all(np.isfinite(data.data))

    def test_crosscorrelate_scalar_without_randoms(self, catalogs, config):
        reference, unknown, _ = catalogs
        (corr,) = crosscorrelate_scalar(config, reference, unknown)
        assert corr.dr is not None  # mean-kappa normalisation term
        data = corr.sample()
        assert np.all(np.isfinite(data.data))

    def test_crosscorrelate_scalar_with_randoms(self, catalogs, config):
        reference, unknown, randoms = catalogs
        (corr,) = crosscorrelate_scalar(
            config, reference, unknown, unk_rand=randoms
        )
        data = corr.sample()
        assert np.all(np.isfinite(data.data))

    def test_scalar_estimator_name(self, catalogs, config):
        reference, _, _ = catalogs
        (corr,) = autocorrelate_scalar(config, reference)
        assert corr.get_estimator().name == "SC"

    def test_hdf_roundtrip(self, catalogs, config, tmp_path):
        from yet_another_wizz_tpu.correlation.corrfunc import load_corrfunc

        reference, _, _ = catalogs
        (corr,) = autocorrelate_scalar(config, reference)
        corr.to_file(tmp_path / "scalar.hdf")
        clone = load_corrfunc(tmp_path / "scalar.hdf")
        assert isinstance(clone, ScalarCorrFunc)
        assert clone == corr


class TestNkMode:
    def test_nk_counts_match_oracle(self, catalogs, config):
        """nk: number weights on the binned side, kappa weights on the
        unknown side."""
        reference, unknown, _ = catalogs
        from yet_another_wizz_tpu.correlation.measurements import PatchLinkage

        links = PatchLinkage.from_catalogs(config, reference, unknown)
        engine = links.count_pairs(
            reference, unknown, mode="nk", backend="xla"
        )
        oracle = links.count_pairs(
            reference, unknown, mode="nk", backend="oracle"
        )
        assert_allclose(
            engine[0].counts.counts, oracle[0].counts.counts,
            rtol=1e-4, atol=1.0,
        )
        # nk must differ from nn (kappa weighting applied)
        plain = links.count_pairs(reference, unknown, mode="nn", backend="xla")
        assert not np.allclose(
            engine[0].counts.counts, plain[0].counts.counts
        )


class TestScalarExecutionOptions:
    """Scalar measurements accept the same execution options as the
    number-count functions (mesh, audit, blocked path)."""

    def test_autocorrelate_scalar_on_mesh(self, catalogs, config):
        from yet_another_wizz_tpu.parallel import default_mesh

        reference, _, _ = catalogs
        (single,) = autocorrelate_scalar(config, reference, backend="xla")
        (sharded,) = autocorrelate_scalar(
            config, reference, mesh=default_mesh(4)
        )
        assert_allclose(
            sharded.sample().data, single.sample().data, rtol=1e-4
        )

    def test_crosscorrelate_scalar_on_mesh_and_audit(self, catalogs, config):
        from yet_another_wizz_tpu.parallel import default_mesh

        reference, unknown, randoms = catalogs
        (single,) = crosscorrelate_scalar(
            config, reference, unknown, unk_rand=randoms, backend="xla"
        )
        (sharded,) = crosscorrelate_scalar(
            config, reference, unknown, unk_rand=randoms,
            mesh=default_mesh(4), data_sharding="columns",
        )
        assert_allclose(
            sharded.sample().data, single.sample().data, rtol=1e-4
        )
        (audited,) = crosscorrelate_scalar(
            config, reference, unknown, unk_rand=randoms,
            backend="xla", audit=True,
        )
        assert_allclose(
            audited.sample().data, single.sample().data, rtol=1e-3
        )

    def test_autocorrelate_scalar_blocked(self, catalogs, config):
        reference, _, _ = catalogs
        (single,) = autocorrelate_scalar(config, reference, backend="xla")
        (blocked,) = autocorrelate_scalar(
            config, reference, backend="xla", max_resident_patches=2
        )
        assert_allclose(
            blocked.sample().data, single.sample().data, rtol=1e-4
        )


def test_scalar_cross_with_rweight_direct_matches_oracle():
    """Scalar (kappa-weighted) counting composes with the direct
    separation-weighted mode: signed pair weights scale linearly with the
    per-pair interval weight."""
    import numpy as np
    from numpy.testing import assert_allclose

    from yet_another_wizz_tpu import Catalog, Configuration
    from yet_another_wizz_tpu.correlation.measurements import (
        PatchLinkage,
        crosscorrelate_scalar,
    )
    from yet_another_wizz_tpu.examples import generate_mock_data

    rng = np.random.default_rng(31)
    mock = generate_mock_data(1200, 1800, 2500, seed=31)
    mock["reference"]["kappa"] = rng.normal(0.0, 1.0, 1200)
    ref = Catalog.from_arrays(**mock["reference"], degrees=False, patch_num=4)
    unk = Catalog.from_arrays(
        **mock["unknown"], degrees=False, patch_centers=ref.get_centers()
    )
    rand = Catalog.from_arrays(
        **mock["randoms"], degrees=False, patch_centers=ref.get_centers()
    )
    config = Configuration.create(
        rmin=[300, 800], rmax=[800, 3000], unit="kpc",
        zmin=0.15, zmax=1.0, num_bins=3, rweight=-1.0, resolution=24,
    )
    links = PatchLinkage.from_catalogs(config, ref, unk, rand)
    assert links.edges.direct is not None  # heuristic engaged

    xla = crosscorrelate_scalar(
        config, ref, unk, unk_rand=rand, backend="xla"
    )
    oracle = crosscorrelate_scalar(
        config, ref, unk, unk_rand=rand, backend="oracle"
    )
    for corr_x, corr_o in zip(xla, oracle):
        assert_allclose(
            corr_x.sample().data, corr_o.sample().data,
            rtol=1e-4, atol=1e-7,
        )
