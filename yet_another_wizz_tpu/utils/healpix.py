"""Minimal HEALPix pixelisation math (RING ordering), pure numpy.

The reference uses the ``healpy`` C++ bindings for its HealPix-based random
generator (/root/reference/src/yaw/randoms.py:262-363); healpy is not
available in this environment, so the required subset is implemented here:
angle -> pixel (``ang2pix_ring``) and pixel -> center angle
(``pix2ang_ring``), following the standard HEALPix equations (Gorski et
al. 2005).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from numpy.typing import ArrayLike, NDArray

__all__ = [
    "ang2pix_ring",
    "npix_to_nside",
    "nside_to_npix",
    "pix2ang_ring",
]


def nside_to_npix(nside: int) -> int:
    """Number of pixels of an nside resolution map."""
    return 12 * nside * nside


def npix_to_nside(npix: int) -> int:
    """Resolution parameter from the number of map pixels."""
    nside = int(round(np.sqrt(npix / 12.0)))
    if nside_to_npix(nside) != npix:
        raise ValueError(f"invalid number of healpix pixels: {npix}")
    return nside


def ang2pix_ring(nside: int, theta: ArrayLike, phi: ArrayLike) -> NDArray:
    """RING-ordered pixel index for colatitude ``theta`` and longitude
    ``phi`` (radian)."""
    theta = np.atleast_1d(np.asarray(theta, dtype=np.float64))
    phi = np.atleast_1d(np.asarray(phi, dtype=np.float64))
    z = np.cos(theta)
    za = np.abs(z)
    tt = np.mod(phi, 2.0 * np.pi) / (0.5 * np.pi)  # in [0, 4)

    pix = np.empty(len(z), dtype=np.int64)
    ncap = 2 * nside * (nside - 1)
    npix = nside_to_npix(nside)

    equatorial = za <= 2.0 / 3.0
    if np.any(equatorial):
        zeq, tteq = z[equatorial], tt[equatorial]
        temp1 = nside * (0.5 + tteq)
        temp2 = nside * zeq * 0.75
        jp = np.floor(temp1 - temp2).astype(np.int64)
        jm = np.floor(temp1 + temp2).astype(np.int64)
        ring = nside + 1 + jp - jm  # ring number counted from z = 2/3
        kshift = 1 - (ring & 1)
        ip = (jp + jm - nside + kshift + 1) // 2
        ip = np.mod(ip, 4 * nside)
        pix[equatorial] = ncap + (ring - 1) * 4 * nside + ip

    polar = ~equatorial
    if np.any(polar):
        zpo, ttpo = z[polar], tt[polar]
        tp = ttpo - np.floor(ttpo)
        tmp = nside * np.sqrt(3.0 * (1.0 - za[polar]))
        jp = np.floor(tp * tmp).astype(np.int64)
        jm = np.floor((1.0 - tp) * tmp).astype(np.int64)
        ring = jp + jm + 1
        ip = np.floor(ttpo * ring).astype(np.int64)
        ip = np.mod(ip, 4 * ring)
        north = 2 * ring * (ring - 1) + ip
        south = npix - 2 * ring * (ring + 1) + ip
        pix[polar] = np.where(zpo > 0, north, south)

    return pix


def pix2ang_ring(nside: int, pix: ArrayLike) -> tuple[NDArray, NDArray]:
    """Center (colatitude, longitude) in radian of RING-ordered pixels."""
    pix = np.atleast_1d(np.asarray(pix, dtype=np.int64))
    npix = nside_to_npix(nside)
    if np.any((pix < 0) | (pix >= npix)):
        raise ValueError("pixel index out of range")
    ncap = 2 * nside * (nside - 1)

    z = np.empty(len(pix), dtype=np.float64)
    phi = np.empty(len(pix), dtype=np.float64)

    north = pix < ncap
    if np.any(north):
        p = pix[north]
        # ring index: invert p = 2 ring (ring - 1) + ip with ip < 4 ring
        ring = np.floor(0.5 * (1 + np.sqrt(1 + 2 * p))).astype(np.int64)
        too_big = 2 * ring * (ring - 1) > p
        ring[too_big] -= 1
        ip = p - 2 * ring * (ring - 1)
        z[north] = 1.0 - (ring**2) / (3.0 * nside**2)
        phi[north] = (ip + 0.5) * np.pi / (2.0 * ring)

    equatorial = (pix >= ncap) & (pix < npix - ncap)
    if np.any(equatorial):
        p = pix[equatorial] - ncap
        ring = p // (4 * nside) + nside
        ip = np.mod(p, 4 * nside)
        fodd = 0.5 * (1 + np.mod(ring + nside, 2))
        z[equatorial] = (2 * nside - ring) * 2.0 / (3.0 * nside)
        phi[equatorial] = (ip + 1 - fodd) * np.pi / (2.0 * nside)

    south = pix >= npix - ncap
    if np.any(south):
        p = npix - 1 - pix[south]
        ring = np.floor(0.5 * (1 + np.sqrt(1 + 2 * p))).astype(np.int64)
        too_big = 2 * ring * (ring - 1) > p
        ring[too_big] -= 1
        ip = p - 2 * ring * (ring - 1)
        z[south] = -1.0 + (ring**2) / (3.0 * nside**2)
        phi[south] = (4 * ring - ip - 0.5) * np.pi / (2.0 * ring)

    return np.arccos(np.clip(z, -1, 1)), np.mod(phi, 2 * np.pi)
