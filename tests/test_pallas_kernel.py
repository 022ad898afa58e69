"""Parity of the Pallas TPU kernel (interpreter mode on CPU) with the XLA
reference path of the pair-count engine."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from test_engine import (
    patch_geometry,
    random_cap_catalog,
    simple_patches,
)
from yet_another_wizz_tpu.ops.linkage import build_linkage, build_tile_pairs
from yet_another_wizz_tpu.ops.paircount import count_pairs_tiles
from yet_another_wizz_tpu.ops.tiles import build_tile_set


@pytest.mark.parametrize("cols_binned", [False, True])
def test_pallas_matches_xla(rng, cols_binned):
    num_bins, num_patches, tile_size = 3, 4, 64
    xyz1, w1, z1 = random_cap_catalog(rng, 1500, num_bins)
    xyz2, w2, z2 = random_cap_catalog(rng, 1200, num_bins)
    patch1 = simple_patches(xyz1, num_patches, np.random.default_rng(3))
    patch2 = simple_patches(xyz2, num_patches, np.random.default_rng(3))

    ts1 = build_tile_set(
        xyz1, patch1, num_patches, weights=w1, zbins=z1, num_bins=num_bins,
        tile_size=tile_size,
    )
    ts2 = build_tile_set(
        xyz2, patch2, num_patches, weights=w2,
        zbins=z2 if cols_binned else None,
        num_bins=num_bins if cols_binned else 0,
        tile_size=tile_size,
    )

    edges = np.deg2rad(np.tile((0.2, 0.7, 1.0), (num_bins, 1)))
    chord2 = ((2 * np.sin(edges / 2)) ** 2).astype(np.float32)
    centers, radii = patch_geometry(xyz1, patch1, num_patches)
    linkage = build_linkage(centers, radii, edges.max() * 1.000001)
    pairs = build_tile_pairs(ts1, ts2, linkage, auto=False)

    via_xla = count_pairs_tiles(ts1, ts2, pairs, chord2, backend="xla")
    via_pallas = count_pairs_tiles(ts1, ts2, pairs, chord2, backend="pallas")
    # identical math: results should agree to float32 accumulation noise
    assert_allclose(via_pallas, via_xla, rtol=1e-6, atol=1e-3)


def test_pallas_single_slot_accumulation(rng):
    """Many tile pairs landing in one output slot must accumulate."""
    num_bins = 2
    xyz, w, z = random_cap_catalog(rng, 2000, num_bins, cap_deg=3.0)
    patches = np.zeros(2000, dtype=int)
    ts = build_tile_set(
        xyz, patches, 1, weights=w, zbins=z, num_bins=num_bins, tile_size=64
    )
    edges = np.deg2rad(np.tile((0.5, 2.0), (num_bins, 1)))
    chord2 = ((2 * np.sin(edges / 2)) ** 2).astype(np.float32)
    centers, radii = patch_geometry(xyz, patches, 1)
    linkage = build_linkage(centers, radii, edges.max() * 1.01)
    pairs = build_tile_pairs(ts, ts, linkage, auto=True)
    assert pairs.num_slots == 1 and pairs.num_pairs > 100

    via_xla = count_pairs_tiles(ts, ts, pairs, chord2, backend="xla")
    via_pallas = count_pairs_tiles(ts, ts, pairs, chord2, backend="pallas")
    assert_allclose(via_pallas, via_xla, rtol=1e-5, atol=1e-2)


@pytest.mark.parametrize("max_pairs", [8, 32])
def test_pallas_multi_segment(rng, max_pairs):
    """Forcing many small segments exercises the per-segment visited-slot
    masking: XLA may hand a later segment an output buffer aliasing an
    earlier segment's result, and unvisited slots must not leak stale
    counts (the historical failure mode was an exact 2x doubling)."""
    from yet_another_wizz_tpu.ops.pallas_paircount import count_pairs_pallas

    num_bins, num_patches, tile_size = 2, 5, 32
    xyz1, w1, z1 = random_cap_catalog(rng, 2000, num_bins)
    xyz2, w2, _ = random_cap_catalog(rng, 2500, num_bins)
    patch1 = simple_patches(xyz1, num_patches, np.random.default_rng(3))
    patch2 = simple_patches(xyz2, num_patches, np.random.default_rng(3))
    ts1 = build_tile_set(
        xyz1, patch1, num_patches, weights=w1, zbins=z1, num_bins=num_bins,
        tile_size=tile_size,
    )
    ts2 = build_tile_set(xyz2, patch2, num_patches, weights=w2,
                         tile_size=tile_size)
    edges = np.deg2rad(np.tile((0.2, 1.0), (num_bins, 1)))
    chord2 = ((2 * np.sin(edges / 2)) ** 2).astype(np.float32)
    centers, radii = patch_geometry(xyz1, patch1, num_patches)
    linkage = build_linkage(centers, radii, edges.max() * 1.000001)
    pairs = build_tile_pairs(ts1, ts2, linkage, auto=False)
    assert pairs.num_pairs > 4 * max_pairs  # really multi-segment

    expected = count_pairs_tiles(ts1, ts2, pairs, chord2, backend="xla")
    import jax

    segmented = np.asarray(
        jax.device_get(
            count_pairs_pallas(
                ts1.device_data(), ts2.device_data(), pairs,
                chord2, cols_binned=False, max_pairs_per_call=max_pairs,
            )
        ),
        dtype=np.float64,
    )
    assert_allclose(segmented, expected, rtol=1e-6, atol=1e-3)


def test_empty_slot_rows_are_zero(rng):
    """A linked patch pair whose tile pairs were ALL cap-pruned has a slot
    but no pair-list entries; its output row must come back exactly zero
    (regression: the unmasked single-launch path returned uninitialised
    HBM for such rows on hardware — caught by scripts/tpu_validation.py)."""
    from test_engine import (
        patch_geometry, random_cap_catalog, simple_patches,
    )
    from yet_another_wizz_tpu.ops.linkage import (
        TilePairs, build_linkage, build_tile_pairs,
    )
    from yet_another_wizz_tpu.ops.paircount import count_pairs_tiles
    from yet_another_wizz_tpu.ops.tiles import build_tile_set

    num_bins, num_patches = 2, 4
    xyz1, w1, z1 = random_cap_catalog(rng, 1500, num_bins)
    xyz2, w2, _ = random_cap_catalog(rng, 2000, num_bins)
    patch1 = simple_patches(xyz1, num_patches, np.random.default_rng(3))
    patch2 = simple_patches(xyz2, num_patches, np.random.default_rng(3))
    ts1 = build_tile_set(
        xyz1, patch1, num_patches, weights=w1, zbins=z1,
        num_bins=num_bins, tile_size=64,
    )
    ts2 = build_tile_set(xyz2, patch2, num_patches, weights=w2, tile_size=64)
    edges = np.deg2rad(np.tile((0.2, 1.0), (num_bins, 1)))
    chord2 = ((2 * np.sin(edges / 2)) ** 2).astype(np.float32)
    centers, radii = patch_geometry(xyz1, patch1, num_patches)
    linkage = build_linkage(centers, radii, edges.max() * 1.000001)
    pairs = build_tile_pairs(ts1, ts2, linkage, auto=False)

    # craft extra slots with no tile-pair entries, interleaved at the END
    # of the slot id range (the list stays slot-sorted)
    extra = np.array([[0, 1], [1, 0], [2, 3]])
    crafted = TilePairs(
        tile1=pairs.tile1,
        tile2=pairs.tile2,
        slot=pairs.slot,
        slot_patches=np.concatenate([pairs.slot_patches, extra]),
    )
    num_real = pairs.num_slots

    for backend in ("pallas", "xla"):
        counts = count_pairs_tiles(ts1, ts2, crafted, chord2, backend=backend)
        assert counts.shape[0] == num_real + 3
        np.testing.assert_array_equal(counts[num_real:], 0.0)
        np.testing.assert_allclose(
            counts[:num_real],
            count_pairs_tiles(ts1, ts2, pairs, chord2, backend="xla"),
            rtol=1e-5, atol=1e-2,
        )
