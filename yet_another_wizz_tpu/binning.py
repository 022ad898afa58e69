"""Contiguous redshift bin edges with closed-left/right semantics.

Capability parity with the reference ``yaw.binning``
(/root/reference/src/yaw/binning.py:51-159): a :class:`Binning` container
with edge/center/width accessors, slicing and iteration, HDF5 round trips
(including the legacy v2 layout), and edge validation.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

from yet_another_wizz_tpu.options import Closed
from yet_another_wizz_tpu.utils import HDF_COMPRESSION, write_version_tag
from yet_another_wizz_tpu.utils.abc import HdfSerializable, TypeSliceIndex

if TYPE_CHECKING:
    from collections.abc import Iterator
    from typing import Any

    from h5py import Group
    from numpy.typing import ArrayLike, NDArray
    from typing_extensions import Self

__all__ = [
    "Binning",
    "parse_binning",
    "load_legacy_binning",
]


def parse_binning(edges: ArrayLike | None, *, optional: bool = False) -> NDArray | None:
    """Validate an array of bin edges (1-dim, >= 2 entries, strictly
    increasing). ``None`` passes through when ``optional``."""
    if edges is None and optional:
        return None

    edges = np.asarray(edges, dtype=np.float64)
    if edges.ndim != 1 or len(edges) < 2:
        raise ValueError("bin edges must be one-dimensionals with length > 2")
    if np.any(np.diff(edges) <= 0.0):
        raise ValueError("bin edges must increase monotonically")
    return edges


class Binning(HdfSerializable):
    """A set of contiguous redshift bins defined by their edges.

    Args:
        edges:
            Monotonically increasing bin edges, including the rightmost edge.
        closed:
            Which side of each bin interval is closed, ``"left"`` or
            ``"right"`` (default).
    """

    __slots__ = ("edges", "closed")

    edges: NDArray
    """All bin edges, including the rightmost."""
    closed: Closed
    """Which side of the bin intervals is closed."""

    def __init__(self, edges: ArrayLike, closed: Closed | str = Closed.right) -> None:
        self.edges = parse_binning(edges)
        self.closed = Closed(closed)

    @classmethod
    def from_hdf(cls: type[Self], source: Group) -> Self:
        return cls(
            source["edges"][:],
            closed=source["closed"][()].decode("utf-8"),
        )

    def to_hdf(self, dest: Group) -> None:
        write_version_tag(dest)
        dest.create_dataset("closed", data=str(self.closed))
        dest.create_dataset("edges", data=self.edges, **HDF_COMPRESSION)

    def __repr__(self) -> str:
        lo, hi = self.edges[0], self.edges[-1]
        brackets = "[)" if self.closed == Closed.left else "(]"
        return f"{len(self)} bins @ {brackets[0]}{lo:.3f}...{hi:.3f}{brackets[1]}"

    def __getstate__(self) -> dict:
        return dict(edges=self.edges, closed=self.closed)

    def __setstate__(self, state: dict) -> None:
        self.edges = state["edges"]
        self.closed = state["closed"]

    def __len__(self) -> int:
        return len(self.edges) - 1

    def __getitem__(self, item: TypeSliceIndex) -> Binning:
        lefts = np.atleast_1d(self.left[item])
        rights = np.atleast_1d(self.right[item])
        return type(self)(np.append(lefts, rights[-1]), closed=self.closed)

    def __iter__(self) -> Iterator[Binning]:
        for i in range(len(self)):
            yield self[i]

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, type(self)):
            return NotImplemented
        return (
            np.array_equal(self.edges, other.edges) and self.closed == other.closed
        )

    __hash__ = None

    @property
    def mids(self) -> NDArray:
        """Centers of the bins."""
        return 0.5 * (self.edges[:-1] + self.edges[1:])

    @property
    def left(self) -> NDArray:
        """Left edges of the bins."""
        return self.edges[:-1]

    @property
    def right(self) -> NDArray:
        """Right edges of the bins."""
        return self.edges[1:]

    @property
    def dz(self) -> NDArray:
        """Widths of the bins."""
        return np.diff(self.edges)

    def copy(self) -> Self:
        """Return a copy of this binning."""
        return Binning(self.edges.copy(), closed=self.closed)

    def digitize(self, redshifts: ArrayLike) -> NDArray:
        """Assign each redshift to a 1-based bin index.

        Matches ``numpy.digitize`` semantics: index 0 means below the first
        edge and ``len(self) + 1`` above the last; with ``closed == "right"``
        values exactly on an edge belong to the bin to the left.
        """
        return np.digitize(
            np.asarray(redshifts), self.edges, right=(self.closed == Closed.right)
        )


def load_legacy_binning(source: Group) -> Binning:
    """Load a binning from the reference's pre-v3 HDF5 layout, where bins are
    stored as (left, right) pairs in a ``binning`` dataset."""
    dataset = source["binning"]
    left, right = dataset[:].T
    return Binning(np.append(left, right[-1]), closed=dataset.attrs["closed"])
