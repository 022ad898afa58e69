"""Multi-host (pod) execution helpers.

Capability parity with the reference's MPI communication layer
(/root/reference/src/yaw/utils/parallel.py:38-484): process-role helpers
(`on_root`), collective broadcast of host-side values, and a barrier —
expressed over jax.distributed instead of mpi4py. On a single process all
helpers degrade to no-ops, mirroring the reference's ``MockComm``.

The data-plane collectives (``psum`` over the tile-pair grid) live in
:mod:`yet_another_wizz_tpu.parallel.sharded`; this module only covers
host-side coordination (configuration exchange, root-only I/O).
"""

from __future__ import annotations

import logging
import pickle
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from typing import Any

__all__ = [
    "barrier",
    "broadcast",
    "initialize",
    "num_processes",
    "on_root",
    "process_index",
]

logger = logging.getLogger(__name__)

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    process_count: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialise jax.distributed for a multi-host pod (no-op when already
    initialised or when running single-host with no coordinator)."""
    global _initialized
    if _initialized:
        return
    import jax

    if coordinator_address is None and process_count in (None, 1):
        _initialized = True  # single host, nothing to set up
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=process_count,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "initialised process %d of %d", process_index(), num_processes()
    )


def process_index() -> int:
    """Index of this host process (0 on a single host)."""
    import jax

    return jax.process_index()


def num_processes() -> int:
    """Number of host processes in the job."""
    import jax

    return jax.process_count()


def on_root() -> bool:
    """Whether this process performs root-only work (logging, file I/O) —
    the analogue of the reference's ``parallel.on_root()``."""
    return process_index() == 0


def barrier(name: str = "yawt_barrier") -> None:
    """Synchronise all host processes (no-op single-host)."""
    if num_processes() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast(value: Any, *, is_source: bool | None = None) -> Any:
    """Broadcast an arbitrary picklable host-side value from the root
    process to all processes (the analogue of the reference's recursive
    ``bcast_auto``; small metadata only — bulk data stays sharded)."""
    if num_processes() == 1:
        return value
    from jax.experimental import multihost_utils

    if is_source is None:
        is_source = on_root()

    payload = pickle.dumps(value) if is_source else b""
    data = np.frombuffer(payload, dtype=np.uint8)
    # exchange the length first, then the padded payload
    length = multihost_utils.broadcast_one_to_all(
        np.asarray([len(data)], dtype=np.int64), is_source=is_source
    )[0]
    buffer = np.zeros(int(length), dtype=np.uint8)
    buffer[: len(data)] = data
    result = multihost_utils.broadcast_one_to_all(
        buffer, is_source=is_source
    )
    return pickle.loads(result.tobytes())
