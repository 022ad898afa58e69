"""Shard the tile-pair grid over a device mesh.

Design (see SURVEY.md section 2.2): the unit of distribution is the flat,
slot-sorted tile-pair list from
:func:`yet_another_wizz_tpu.ops.linkage.build_tile_pairs`. Each device
receives an equal, contiguous chunk (padded with dump-slot entries),
evaluates the same vmapped pair-count program as the single-chip XLA path,
scatter-adds into its private ``(num_slots + 1, B, E)`` partial tensor, and
the partials are summed with ``psum`` over the mesh. Tile data is
replicated (tile access is data-dependent); catalog-sharded layouts with
ICI all-gathers are the planned optimisation for pod-scale inputs.
"""

from __future__ import annotations

from functools import partial
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yet_another_wizz_tpu.ops.paircount import pair_block_counts

if TYPE_CHECKING:
    from numpy.typing import NDArray

    from yet_another_wizz_tpu.ops.linkage import TilePairs
    from yet_another_wizz_tpu.ops.tiles import TileSet

__all__ = [
    "count_pairs_sharded",
    "default_mesh",
]

MESH_AXIS = "shards"


def default_mesh(num_devices: int | None = None) -> Mesh:
    """A 1-dim mesh over the available (or first ``num_devices``) devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (MESH_AXIS,))


def _partial_counts(
    lane1, lane2, tile1, tile2, slots, table,
    *,
    cols_binned: bool,
    num_slots: int,
    chunk_size: int,
):
    """Per-device scatter-add over the local chunk of the pair list."""
    num_chunks = tile1.shape[0] // chunk_size
    shape = (num_chunks, chunk_size)

    pair_fn = jax.vmap(
        partial(pair_block_counts, cols_binned=cols_binned),
        in_axes=(0, 0, None),
    )

    def body(acc, chunk):
        idx1, idx2, slot = chunk
        blocks = pair_fn(lane1[idx1], lane2[idx2], table)
        return acc.at[slot].add(blocks), None

    init = jnp.zeros((num_slots + 1, *table.shape), dtype=jnp.float32)
    # the carry must carry the same device-varying type as the sharded
    # chunk data it accumulates (jax >= 0.8 shard_map axis tracking)
    if hasattr(jax.lax, "pcast"):
        init = jax.lax.pcast(init, to="varying", axis_name=MESH_AXIS)
    else:  # pragma: no cover - older jax
        init = jax.lax.pvary(init, MESH_AXIS)
    acc, _ = jax.lax.scan(
        body,
        init,
        (tile1.reshape(shape), tile2.reshape(shape), slots.reshape(shape)),
    )
    return acc


def count_pairs_sharded(
    tiles1: TileSet,
    tiles2: TileSet,
    pairs: TilePairs,
    chord2_table: NDArray,
    *,
    mesh: Mesh | None = None,
    chunk_size: int = 8,
) -> NDArray:
    """Multi-device pair counting over a mesh; same result contract as
    :func:`yet_another_wizz_tpu.ops.paircount.count_pairs_tiles`."""
    mesh = mesh or default_mesh()
    num_devices = mesh.devices.size
    num_slots = pairs.num_slots
    cols_binned = tiles2.binned

    table = jnp.asarray(chord2_table, dtype=jnp.float32)
    if pairs.num_pairs == 0:
        return np.zeros((num_slots, *table.shape), dtype=np.float64)

    # pad the pair list so every device gets whole chunks; padding entries
    # point at tile 0 and the trailing dump slot
    quantum = num_devices * chunk_size
    padded = -(-pairs.num_pairs // quantum) * quantum
    tile1 = np.zeros(padded, dtype=np.int32)
    tile2 = np.zeros(padded, dtype=np.int32)
    slots = np.full(padded, num_slots, dtype=np.int32)
    tile1[: pairs.num_pairs] = pairs.tile1
    tile2[: pairs.num_pairs] = pairs.tile2
    slots[: pairs.num_pairs] = pairs.slot

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(MESH_AXIS))

    lane1 = jax.device_put(tiles1.lane_data, replicated)
    lane2 = jax.device_put(tiles2.lane_data, replicated)
    table = jax.device_put(table, replicated)
    tile1 = jax.device_put(jnp.asarray(tile1), sharded)
    tile2 = jax.device_put(jnp.asarray(tile2), sharded)
    slots = jax.device_put(jnp.asarray(slots), sharded)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(MESH_AXIS), P(MESH_AXIS), P(MESH_AXIS), P()),
        out_specs=P(),
    )
    def sharded_counts(lane1, lane2, tile1, tile2, slots, table):
        local = _partial_counts(
            lane1, lane2, tile1, tile2, slots, table,
            cols_binned=cols_binned,
            num_slots=num_slots,
            chunk_size=chunk_size,
        )
        return jax.lax.psum(local, MESH_AXIS)

    result = sharded_counts(lane1, lane2, tile1, tile2, slots, table)
    return np.asarray(jax.device_get(result), dtype=np.float64)[:-1]
