"""Correlation estimators: pair counts -> correlation amplitude.

Capability parity with the reference's estimator functions
(/root/reference/src/yaw/correlation/corrfunc.py:69-97); registered by
their conventional short names so they can be selected explicitly
(``get_estimator("LS")``) in addition to the automatic choice made by
:class:`~yet_another_wizz_tpu.correlation.corrfunc.CorrFunc`.

All estimators are pure elementwise algebra on (samples of) patch-summed,
normalised pair counts, applied identically to data vectors and to every
resampled realisation.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from collections.abc import Callable

    from numpy.typing import NDArray

__all__ = [
    "ESTIMATORS",
    "EstimatorError",
    "davis_peebles",
    "get_estimator",
    "landy_szalay",
    "scalar_correlation",
]


class EstimatorError(Exception):
    pass


def _named(key: str):
    def decorator(func):
        func.name = key
        return func

    return decorator


@_named("DP")
def davis_peebles(
    *, dd: NDArray, dr: NDArray | None = None, rd: NDArray | None = None
) -> NDArray:
    """Davis-Peebles estimator ``(DD - DR) / DR`` (or with RD)."""
    if dr is None and rd is None:
        raise EstimatorError("either 'dr' or 'rd' are required")
    mixed = dr if rd is None else rd
    return (dd - mixed) / mixed


@_named("LS")
def landy_szalay(
    *, dd: NDArray, dr: NDArray, rd: NDArray | None = None, rr: NDArray
) -> NDArray:
    """Landy-Szalay estimator ``(DD - DR - RD + RR) / RR``."""
    if rd is None:
        rd = dr
    return ((dd - dr) + (rr - rd)) / rr


@_named("SC")
def scalar_correlation(*, dd: NDArray, dr: NDArray | None = None) -> NDArray:
    """Scalar-field estimator: normalised kappa counts, optionally with the
    random term subtracted."""
    return dd if dr is None else dd - dr


ESTIMATORS: dict[str, Callable[..., "NDArray"]] = {
    "DP": davis_peebles,
    "LS": landy_szalay,
    "SC": scalar_correlation,
}
"""Registry of estimator models by conventional short name."""


def get_estimator(name: str) -> Callable[..., "NDArray"]:
    """Look up an estimator model by name (``DP``, ``LS`` or ``SC``)."""
    try:
        return ESTIMATORS[name.upper()]
    except KeyError:
        options = ", ".join(ESTIMATORS)
        raise ValueError(
            f"unknown estimator '{name}', registered: {options}"
        ) from None
