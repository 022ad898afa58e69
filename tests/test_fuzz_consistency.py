"""Randomised consistency sweep: engine vs float64 oracle across varied
geometries, binnings, scale configurations and weighting setups."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from test_engine import patch_geometry, simple_patches
from yet_another_wizz_tpu.coordinates import radec_to_xyz
from yet_another_wizz_tpu.ops.cpu_oracle import count_pairs_oracle
from yet_another_wizz_tpu.ops.linkage import build_linkage, build_tile_pairs
from yet_another_wizz_tpu.ops.paircount import count_pairs_tiles, _unpack_tileset
from yet_another_wizz_tpu.ops.tiles import build_tile_set


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(6))
def test_random_configuration_matches_oracle(trial):
    rng = np.random.default_rng(1000 + trial)
    num_bins = int(rng.integers(1, 7))
    num_patches = int(rng.integers(1, 8))
    tile_size = int(rng.choice([32, 64, 128]))
    n1 = int(rng.integers(500, 4000))
    n2 = int(rng.integers(500, 4000))
    weighted = bool(rng.integers(0, 2))
    cols_binned = bool(rng.integers(0, 2))
    auto = bool(rng.integers(0, 2))

    # random sky footprint: box of random size and position
    ra0 = rng.uniform(0, 2 * np.pi)
    dec0 = rng.uniform(-1.0, 1.0)
    width = rng.uniform(0.05, 0.6)

    def sample(n):
        ra = ra0 + rng.uniform(0, width, n)
        dec = np.clip(dec0 + rng.uniform(0, width, n), -1.4, 1.4)
        xyz = radec_to_xyz(ra, dec)
        w = rng.uniform(0.25, 4.0, n) if weighted else np.ones(n)
        z = rng.integers(0, num_bins, n)
        return xyz, w, z

    xyz1, w1, z1 = sample(n1)
    if auto:
        xyz2, w2, z2 = xyz1, w1, z1
        cols_binned = True
    else:
        xyz2, w2, z2 = sample(n2)

    patch_rng = np.random.default_rng(trial)
    patch1 = simple_patches(xyz1, num_patches, patch_rng)
    patch2 = (
        patch1 if auto
        else np.argmax(
            xyz2 @ xyz1[np.random.default_rng(trial).choice(
                n1, num_patches, replace=False
            )].T,
            axis=1,
        )
    )

    ts1 = build_tile_set(
        xyz1, patch1, num_patches, weights=w1, zbins=z1, num_bins=num_bins,
        tile_size=tile_size,
    )
    ts2 = (
        ts1 if auto else build_tile_set(
            xyz2, patch2, num_patches, weights=w2,
            zbins=z2 if cols_binned else None,
            num_bins=num_bins if cols_binned else 0,
            tile_size=tile_size,
        )
    )

    # random per-bin angular edges (possibly distinct per bin)
    base = np.sort(rng.uniform(2e-4, 0.05, 3))
    factors = rng.uniform(0.8, 1.2, (num_bins, 1))
    edges = base[None, :] * factors
    chord2 = ((2 * np.sin(edges / 2)) ** 2).astype(np.float32)

    centers, radii = patch_geometry(xyz1, patch1, num_patches)
    linkage = build_linkage(centers, radii, float(edges.max()) * 1.000001)
    pairs = build_tile_pairs(ts1, ts2, linkage, auto=auto)

    result = count_pairs_tiles(ts1, ts2, pairs, chord2, backend="xla")
    X1, W1, Z1, P1 = _unpack_tileset(ts1)
    X2, W2, Z2, P2 = _unpack_tileset(ts2)
    expect = count_pairs_oracle(
        X1, W1, Z1, P1, X2, W2, (Z2 if (cols_binned or auto) else None), P2,
        pairs.slot_patches, edges,
    )
    # aggregate parity (boundary flips allowed per slot)
    assert_allclose(
        result.sum(axis=0), expect.sum(axis=0), rtol=5e-6, atol=20.0
    )
    assert_allclose(result, expect, rtol=1e-4, atol=30.0)

    # audit mode repairs boundary flips: slot-exact against the oracle up
    # to float32 accumulation noise
    audited = count_pairs_tiles(
        ts1, ts2, pairs, chord2, backend="xla",
        edges_radian=edges, audit=True,
    )
    assert_allclose(audited, expect, rtol=2e-5, atol=1.0)

    # mesh-sharded execution reproduces the single-device engine exactly
    from yet_another_wizz_tpu.parallel import count_pairs_sharded, default_mesh

    sharding = ("replicated", "columns", "ring")[trial % 3]
    mesh = default_mesh(int(rng.integers(2, 9)))
    sharded = count_pairs_sharded(
        ts1, ts2, pairs, chord2, mesh=mesh, data_sharding=sharding
    )
    assert_allclose(sharded, result, rtol=1e-5, atol=0.5)


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(4))
def test_random_measurement_execution_matrix(trial):
    """The same randomised measurement through every execution path of
    the public API — plain XLA, each mesh layout, the blocked path and
    the boundary audit — must produce identical counts (regression net
    for integration bugs in sharding/bucketing/pruning plumbing)."""
    from yet_another_wizz_tpu import Catalog, Configuration
    from yet_another_wizz_tpu.correlation.measurements import (
        autocorrelate,
        crosscorrelate,
    )
    from yet_another_wizz_tpu.parallel import default_mesh

    rng = np.random.default_rng(7000 + trial)
    num_bins = int(rng.integers(2, 6))
    num_patches = int(rng.integers(3, 9))
    auto = bool(rng.integers(0, 2))
    n_data = int(rng.integers(2000, 5000))
    n_other = int(rng.integers(2000, 5000))

    ra0 = rng.uniform(0, 2 * np.pi)
    dec0 = rng.uniform(-0.9, 0.9)
    width = rng.uniform(0.1, 0.4)

    def catalog(n, centers=None):
        data = dict(
            ra=ra0 + rng.uniform(0, width, n),
            dec=np.clip(dec0 + rng.uniform(0, width, n), -1.45, 1.45),
            redshifts=rng.uniform(0.2, 0.95, n),
            weights=rng.uniform(0.25, 2.0, n),
            degrees=False,
        )
        if centers is None:
            return Catalog.from_arrays(**data, patch_num=num_patches)
        return Catalog.from_arrays(**data, patch_centers=centers)

    data = catalog(n_data)
    other = catalog(n_other, centers=data.get_centers())
    randoms = catalog(n_other, centers=data.get_centers())
    config = Configuration.create(
        rmin=float(rng.uniform(50, 200)),
        rmax=float(rng.uniform(600, 2000)),
        unit="kpc",
        zmin=0.2, zmax=0.95, num_bins=num_bins,
    )

    def run(**kwargs):
        if auto:
            (w,) = autocorrelate(config, data, other, **kwargs)
        else:
            (w,) = crosscorrelate(
                config, data, other, unk_rand=randoms, **kwargs
            )
        return w.dd.counts.get_array()

    baseline = run(backend="xla")
    variants = {
        "mesh-replicated": dict(mesh=default_mesh(4)),
        "mesh-columns": dict(
            mesh=default_mesh(4), data_sharding="columns"
        ),
        "mesh-ring": dict(mesh=default_mesh(4), data_sharding="ring"),
        "blocked": dict(backend="xla", max_resident_patches=3),
        "audit": dict(backend="xla", audit=True),
        "blocked-audit": dict(
            backend="xla", audit=True, max_resident_patches=3
        ),
    }
    for name, kwargs in variants.items():
        result = run(**kwargs)
        assert_allclose(
            result, baseline, rtol=1e-4, atol=1e-2,
            err_msg=f"trial {trial}: {name} diverged",
        )


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(4))
def test_random_rweight_counting_formulations_agree(trial):
    """Randomised separation-weighted configs: the direct per-pair
    sub-interval formulation and the cumulative union-edge histogram are
    mathematically equal counts — through the public API they must agree
    for any weighting exponent, resolution and scale layout."""
    from yet_another_wizz_tpu import Catalog, Configuration
    from yet_another_wizz_tpu.correlation.measurements import crosscorrelate

    rng = np.random.default_rng(9000 + trial)
    num_bins = int(rng.integers(2, 5))
    num_patches = int(rng.integers(3, 7))
    alpha = float(rng.uniform(-2.0, 2.0))
    resolution = int(rng.integers(12, 48))  # >= direct crossover
    num_scales = int(rng.integers(1, 4))

    ra0 = rng.uniform(0, 2 * np.pi)
    dec0 = rng.uniform(-0.9, 0.9)
    width = rng.uniform(0.1, 0.4)

    def catalog(n, centers=None):
        data = dict(
            ra=ra0 + rng.uniform(0, width, n),
            dec=np.clip(dec0 + rng.uniform(0, width, n), -1.45, 1.45),
            redshifts=rng.uniform(0.2, 0.95, n),
            weights=rng.uniform(0.25, 2.0, n),
            degrees=False,
        )
        if centers is None:
            return Catalog.from_arrays(**data, patch_num=num_patches)
        return Catalog.from_arrays(**data, patch_centers=centers)

    data = catalog(3000)
    other = catalog(4000, centers=data.get_centers())
    randoms = catalog(4000, centers=data.get_centers())

    # overlapping multi-scale limits exercise the interior-limit splits
    rmin = np.sort(rng.uniform(40, 300, num_scales))
    rmax = np.sort(rng.uniform(500, 2500, num_scales))

    def run(counting):
        config = Configuration.create(
            rmin=rmin.tolist(), rmax=rmax.tolist(), unit="kpc",
            rweight=alpha, resolution=resolution, counting=counting,
            zmin=0.2, zmax=0.95, num_bins=num_bins,
        )
        funcs = crosscorrelate(config, data, other, unk_rand=randoms,
                               backend="xla")
        return np.stack([w.dd.counts.get_array() for w in funcs])

    direct = run("direct")
    cumulative = run("cumulative")
    assert_allclose(
        direct, cumulative, rtol=5e-5, atol=1e-2,
        err_msg=f"trial {trial}: alpha={alpha} res={resolution}",
    )
