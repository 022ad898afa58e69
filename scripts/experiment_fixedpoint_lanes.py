"""Numerics experiment for the packed-lane link-compression roadmap item.

The uncached survey-scale bench floor is the 32 B/point packed-lane upload
(x/y/z as (hi, lo) float32 pairs + weight + zbin; ROADMAP.md). The proposed
encoding stores int32 fixed-point offsets relative to each tile's cap
center (per-tile scale ~ chord(tile_radius) * 2^-30), cutting coordinate
bytes from 24 to 12 per point. This script measures — on a realistic mock
tile set, entirely on host in float64 — the squared-chord perturbation that
quantisation introduces, and compares it against the exact-boundary audit
band that must absorb it (ops/paircount.py:audit_boundary_counts, engine
band = 2 * (1e-6 * t + |t32 - t|)).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/experiment_fixedpoint_lanes.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from yet_another_wizz_tpu import Catalog
from yet_another_wizz_tpu.binning import Binning
from yet_another_wizz_tpu.coordinates import angle_to_chord
from yet_another_wizz_tpu.examples import generate_mock_data


def tile_points_f64(ts, t: int) -> np.ndarray:
    """Reconstruct the float64 points of tile ``t`` from the (hi, lo) lanes."""
    lanes = ts.lane_data[t].astype(np.float64)
    xyz = lanes[0:3] + lanes[3:6]  # (3, tile_size)
    weights = lanes[6]
    return xyz[:, weights > 0].T  # (n, 3), padding has zero weight


def encode_decode(points: np.ndarray, center: np.ndarray, radius: float):
    """Round-trip through the proposed int32 tile-relative encoding."""
    chord_radius = 2.0 * np.sin(min(radius, np.pi) / 2.0)
    scale = max(chord_radius, 1e-12) * 1.0001 / 2**30
    offsets = points - center
    q = np.rint(offsets / scale)
    assert np.abs(q).max() < 2**31, "offsets exceed int32 under this scale"
    return center + q.astype(np.int64).astype(np.float64) * scale, scale


def main() -> None:
    rng = np.random.default_rng(42)
    mock = generate_mock_data(
        num_reference=200_000, num_unknown=200_000, num_randoms=0, seed=7
    )
    reference = Catalog.from_arrays(
        **mock["reference"], degrees=False, patch_num=64
    )
    binning = Binning(np.linspace(0.15, 1.0, 9))
    ts = reference.get_tiles(binning)
    print(
        f"tile set: {ts.lane_data.shape[0]} tiles x {ts.tile_size}, "
        f"radius median {np.median(ts.tile_radius):.4f} rad, "
        f"max {ts.tile_radius.max():.4f} rad"
    )

    # survey-relevant thresholds: 100 kpc .. 1 Mpc at z=0.15 is the
    # smallest angle the bench configs use (~2e-4 rad)
    thetas = np.array([2e-4, 1e-3, 1e-2, 0.1])
    t64 = angle_to_chord(thetas) ** 2
    t32 = t64.astype(np.float32).astype(np.float64)
    engine_band = 2.0 * (1e-6 * t64 + np.abs(t32 - t64))

    # sample nearby tile pairs (the ones that produce near-threshold
    # distances) and measure the quantisation perturbation of chord^2
    centers = ts.tile_center
    num_tiles = len(centers)
    max_rel = 0.0
    worst_abs = np.zeros_like(t64)
    num_pairs_sampled = 0
    for _ in range(400):
        i = int(rng.integers(num_tiles))
        d2 = ((centers - centers[i]) ** 2).sum(axis=1)
        j = int(np.argsort(d2)[1])  # nearest other tile
        pi, pj = tile_points_f64(ts, i), tile_points_f64(ts, j)
        if not len(pi) or not len(pj):
            continue
        qi, _ = encode_decode(pi, centers[i], ts.tile_radius[i])
        qj, _ = encode_decode(pj, centers[j], ts.tile_radius[j])
        # exact squared chords before/after quantisation
        c2 = ((pi[:, None, :] - pj[None, :, :]) ** 2).sum(axis=2)
        c2q = ((qi[:, None, :] - qj[None, :, :]) ** 2).sum(axis=2)
        delta = np.abs(c2q - c2)
        near = c2 > 1e-12
        max_rel = max(max_rel, float((delta[near] / c2[near]).max()))
        # absolute perturbation at each threshold's distance scale
        for k, t in enumerate(t64):
            sel = np.abs(c2 - t) < 0.25 * t
            if sel.any():
                worst_abs[k] = max(worst_abs[k], float(delta[sel].max()))
        num_pairs_sampled += delta.size

    print(f"pairs sampled: {num_pairs_sampled:.3e}")
    print(f"max relative chord^2 perturbation: {max_rel:.3e}")
    print("per-threshold absolute perturbation vs audit band:")
    for k, theta in enumerate(thetas):
        ratio = worst_abs[k] / engine_band[k] if engine_band[k] else 0.0
        print(
            f"  theta={theta:.0e} rad: |dchord2|max={worst_abs[k]:.3e}  "
            f"engine band={engine_band[k]:.3e}  ratio={ratio:.3f}"
        )
    # the widened band the implementation would use: engine band plus
    # twice the theoretical quantisation term 2*chord*(2*sqrt(3)*s/2)
    s_med = float(np.median(2.0 * np.sin(ts.tile_radius / 2))) * 1.0001 / 2**30
    quant_term = 2.0 * np.sqrt(t64) * (np.sqrt(3.0) * s_med)
    print("widened-band growth (quant term / engine band):")
    for k, theta in enumerate(thetas):
        print(
            f"  theta={theta:.0e} rad: quant={2 * quant_term[k]:.3e} "
            f"(x{2 * quant_term[k] / engine_band[k]:.2f} of engine band)"
        )


if __name__ == "__main__":
    main()
