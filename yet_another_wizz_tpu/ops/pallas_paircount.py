"""Pallas TPU kernel for the tiled pair-count engine.

One grid step processes one (tile_i, tile_j) pair from the flat, slot-sorted
tile-pair list (see :mod:`yet_another_wizz_tpu.ops.linkage`):

- the pair list drives input tile gathering through scalar-prefetch indices
  (``PrefetchScalarGridSpec``), so arbitrary tile pairs stream through VMEM
  with the automatic pallas pipeline (double buffering from HBM);
- squared chord distances are computed on the VPU from (hi, lo)-split
  float32 coordinates (see :mod:`paircount` for the precision rationale);
- cumulative threshold counting and the (bin, edge) reduction mirror
  :func:`yet_another_wizz_tpu.ops.paircount.pair_block_counts` exactly;
- output blocks are indexed by the patch-pair slot; because the pair list
  is sorted by slot, consecutive grid steps revisit the same output block
  and accumulate in VMEM, writing back to HBM only when the slot changes;
- row-side quantities (the transposed tile and the per-row threshold
  rows) are precomputed per tile set by :func:`row_side_inputs` and
  stream in as pipelined inputs keyed by the row-tile index.

Numerical note: per-row threshold selection is an exact gather
(``row_side_inputs``), never a plain matmul — default MXU matmul
precision rounds operands to bfloat16 which would shift angular bin
boundaries by ~0.4%. The final weighted reduction matmul uses
``Precision.HIGHEST``.

Memory note: the precomputed row-side inputs cost HBM — the ROW tile
set holds ``32 + 32 + 4*(E+C)`` bytes/point (lanes + transpose +
threshold rows) instead of the bare 32 B/point lanes (columns stay at
32 B/point): 72 B/point for the common cumulative ``E=2`` survey
config, ~210 B/point for a wide direct-mode table. Catalogs anywhere
near HBM capacity should run through the blocked out-of-core path
(``max_resident_patches``), whose per-block tile sets keep this growth
trivially bounded.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yet_another_wizz_tpu.ops.tiles import bucket_size

if TYPE_CHECKING:
    from yet_another_wizz_tpu.ops.linkage import TilePairs

__all__ = [
    "count_pairs_pallas",
    "pallas_partial_counts",
]


def _paircount_kernel(
    # scalar prefetch
    tile1_ref,
    tile2_ref,
    slot_ref,
    # tensor inputs
    lane1_ref,  # (1, 8, T): row tile, lane layout (bin/weight rows)
    tile1t_ref,  # (1, T, 8): row tile, transposed (precomputed)
    thr_ref,  # (1, T, E [+ C]): per-row thresholds (precomputed)
    lane2_ref,  # (1, 8, T): column tile
    # output
    out_ref,  # (1, B, E)
    *,
    cols_binned: bool,
    num_bins: int,
    num_edges: int,
    direct: tuple | None = None,
):
    k = pl.program_id(0)
    lane1 = lane1_ref[0]  # (8, T)
    lane2 = lane2_ref[0]  # (8, T)

    # the row-side transpose and per-row threshold selection are
    # precomputed ON DEVICE by row_side_inputs (one XLA transpose +
    # gather per tile set): an in-kernel transpose + B-pass one-hot
    # select costs ~2.6 us per row-tile CHANGE, which the slot-sorted
    # pair list amortises over long same-row runs at low patch counts
    # but pays nearly every grid step at high patch counts (short runs).
    # The pallas pipeline re-fetches these blocks only when the row-tile
    # index actually changes.
    tile1 = tile1t_ref[0]  # (T, 8)
    selected = thr_ref[0]  # (T, E [+ C])
    thresholds = selected[:, :num_edges]

    # chord^2 with (hi, lo) compensation — all (T, T) VPU work
    chord2 = None
    for dim in range(3):
        d_hi = tile1[:, dim : dim + 1] - lane2[dim : dim + 1, :]
        d_lo = tile1[:, 3 + dim : 4 + dim] - lane2[3 + dim : 4 + dim, :]
        d = d_hi + d_lo
        chord2 = d * d if chord2 is None else chord2 + d * d

    w_cols = lane2[6:7, :]
    if cols_binned:
        z_rows_col = tile1[:, 7:8]
        z_cols = lane2[7:8, :]
        w_cols_eff = jnp.where(z_rows_col == z_cols, w_cols, 0.0)
    else:
        w_cols_eff = jnp.broadcast_to(w_cols, chord2.shape)

    if direct is not None:
        from yet_another_wizz_tpu.ops.gweight import apply_direct_weight

        w_cols_eff = apply_direct_weight(
            chord2, selected[:, num_edges:], w_cols_eff,
            num_sub=direct[0], num_below=direct[1], num_above=direct[2],
            small_angle=len(direct) > 3 and direct[3],
        )

    # cumulative counts per row and edge
    cols = []
    for e in range(num_edges):
        mask = chord2 <= thresholds[:, e : e + 1]
        cols.append(
            jnp.sum(jnp.where(mask, w_cols_eff, 0.0), axis=1, keepdims=True)
        )
    row_counts = jnp.concatenate(cols, axis=1)  # (T, E)

    # (B, E) block: reduce rows into bins weighted by row weights
    z_rows = lane1[7:8, :]  # (1, T)
    w_rows = lane1[6:7, :]
    bin_ids = jax.lax.broadcasted_iota(
        jnp.int32, (num_bins, z_rows.shape[1]), 0
    ).astype(jnp.float32)
    onehot_w_t = jnp.where(bin_ids == z_rows, w_rows, 0.0)  # (B, T)
    block = jax.lax.dot_general(
        onehot_w_t,
        row_counts,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, E)

    # slot-sorted revisit accumulation
    prev_slot = slot_ref[jnp.maximum(k - 1, 0)]
    is_first = jnp.logical_or(k == 0, slot_ref[k] != prev_slot)

    @pl.when(is_first)
    def _():
        out_ref[0] = block

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[0] = out_ref[0] + block


MAX_PAIRS_PER_CALL = 65_536
"""Upper bound on tile pairs per pallas_call: the three scalar-prefetch
index arrays live in SMEM (~1 MB on v5e), so long pair lists are processed
in fixed-size segments whose outputs are summed on the host. Segment sizes
come from the quarter-octave bucket grid so compiled programs are reused
across calls while bounding grid padding at 25% (powers of two alone
waste up to 50% — every padding entry re-tests a real tile pair)."""


def _grid_size(num_pairs: int, maximum: int) -> int:
    return min(bucket_size(num_pairs, base=512), maximum)


def _counting_width(num_table_cols: int, direct: tuple | None) -> int:
    """Counting-edge columns (shared helper, see ops.gweight)."""
    from yet_another_wizz_tpu.ops.gweight import counting_width

    return counting_width(num_table_cols, direct)


def row_side_inputs(lane_data, chord2_table):
    """Precompute the kernel's row-side inputs for one tile set.

    Returns ``(tiles_t, thr)``: the tiles in transposed ``(N, T, 8)``
    layout and the per-row threshold (+ direct-mode parameter) rows
    ``(N, T, E [+ C])`` gathered from the per-bin table by each row's
    bin id. Plain traced jax ops — they fuse into the surrounding jit /
    shard_map program, or run as two cheap XLA launches when called
    eagerly. The gather is EXACT selection (no arithmetic), numerically
    identical to the one-hot select the kernel previously performed
    (see the module docstring on why a matmul select is not allowed).

    Padding rows (weight 0) gather the bin-0 table row instead of the
    previous all-zero thresholds; their contributions still vanish
    exactly because the final ``(B, T) x (T, E)`` reduction weights them
    by their zero row weight.
    """
    tiles_t = jnp.swapaxes(lane_data, 1, 2)
    bin_ids = lane_data[:, 7, :].astype(jnp.int32)  # (N, T)
    thr = jnp.take(chord2_table, bin_ids, axis=0, mode="clip")
    return tiles_t, thr


@lru_cache(maxsize=256)
def _build_kernel_call(
    segment: int,
    tile_shape: tuple,
    num_slots_out: int,
    num_bins: int,
    num_edges: int,
    cols_binned: bool,
    interpret: bool,
    num_table_cols: int | None = None,
    direct: tuple | None = None,
):
    """Construct (and cache) the pallas_call for one kernel configuration.

    The call object (with its index-map lambdas) must be reused across
    invocations: fresh lambdas defeat jax's trace cache and add ~0.5 s of
    retracing per call.
    """
    if num_table_cols is None:
        num_table_cols = num_edges
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(segment,),
        in_specs=[
            pl.BlockSpec(
                (1, *tile_shape),
                lambda k, t1, t2, sl: (t1[k], 0, 0),
            ),
            pl.BlockSpec(
                (1, tile_shape[1], tile_shape[0]),
                lambda k, t1, t2, sl: (t1[k], 0, 0),
            ),
            pl.BlockSpec(
                (1, tile_shape[1], num_table_cols),
                lambda k, t1, t2, sl: (t1[k], 0, 0),
            ),
            pl.BlockSpec(
                (1, *tile_shape),
                lambda k, t1, t2, sl: (t2[k], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, num_bins, num_edges),
            lambda k, t1, t2, sl: (sl[k], 0, 0),
        ),
    )
    return pl.pallas_call(
        partial(
            _paircount_kernel,
            cols_binned=cols_binned,
            num_bins=num_bins,
            num_edges=num_edges,
            direct=direct,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_slots_out, num_bins, num_edges), jnp.float32
        ),
        interpret=interpret,
    )


@partial(
    jax.jit,
    static_argnames=(
        "num_slots_out", "cols_binned", "interpret", "segment",
        "mask_always", "direct",
    ),
)
def pallas_partial_counts(
    lane_data1,
    lane_data2,
    tile1,
    tile2,
    slots,
    chord2_table,
    *,
    num_slots_out: int,
    cols_binned: bool,
    interpret: bool,
    segment: int,
    mask_always: bool = False,
    direct: tuple | None = None,
) -> jnp.ndarray:
    """Traced core of the Pallas engine over a pre-padded pair list.

    ``tile1``/``tile2``/``slots`` must be padded to a multiple of
    ``segment`` with dump-slot entries; the list is processed in
    fixed-size kernel launches whose partial outputs are combined ON
    DEVICE. Output blocks of slots a launch's grid never visits keep
    whatever memory XLA handed out, so each launch's output is masked by
    a device-computed visited-slot mask before accumulating (a multiply
    would propagate NaN from uninitialised blocks; select instead). A
    single-launch list skips the mask: every real slot is visited and the
    caller slices off the garbage rows at ``>= num_slots + 1``.

    This function contains no host-side work and is itself ``jax.jit``-ed
    (an eager run would pay one remote dispatch per slice/mask op, which
    dominates on a tunneled device); tracing it inside an outer ``jit``
    or per-device ``shard_map`` program simply inlines it. With
    ``mask_always=True`` even a single launch is masked — required under
    ``shard_map``, where each device sees only a chunk of the pair list
    and unmasked garbage rows would be summed into real slots by the
    cross-device ``psum``, and whenever the slot list does not cover
    every real slot (a linked patch pair whose tile pairs were all
    pruned by the bounding caps has a slot but no pair-list entries, so
    its output row is never written and keeps HBM garbage).
    """
    num_bins, num_table_cols = chord2_table.shape
    num_edges = _counting_width(num_table_cols, direct)
    tile_shape = tuple(lane_data1.shape[1:])  # (8, T)
    padded = tile1.shape[0]
    tiles_t, thr = row_side_inputs(lane_data1, chord2_table)

    def build(size):
        return _build_kernel_call(
            size,
            tile_shape,
            num_slots_out,
            num_bins,
            num_edges,
            cols_binned,
            interpret,
            num_table_cols,
            direct,
        )

    total = None
    for lo in range(0, padded, segment):
        # a trailing remainder (lists that are not a segment multiple,
        # e.g. sharded chunk lengths padded for an odd chunk size) runs
        # as its own smaller launch — at most two kernel configurations
        size = min(segment, padded - lo)
        hi = lo + size
        seg_slots = jax.lax.slice(slots, (lo,), (hi,))
        part = build(size)(
            jax.lax.slice(tile1, (lo,), (hi,)),
            jax.lax.slice(tile2, (lo,), (hi,)),
            seg_slots,
            lane_data1,
            tiles_t,
            thr,
            lane_data2,
        )
        if padded == segment and not mask_always:
            return part
        visited = (
            jnp.zeros(num_slots_out, dtype=bool).at[seg_slots].set(True)
        )
        part = jnp.where(visited[:, None, None], part, 0.0)
        total = part if total is None else total + part
    return total


@partial(
    jax.jit,
    static_argnames=(
        "num_slots_out", "cols_binned", "interpret", "segment",
        "mask_always", "direct",
    ),
)
def _partial_counts_stacked(
    lane_data1, lane_data2, stacked, chord2_table, **static
):
    """Single-launch entry taking the stacked ``(3, padded)`` index array:
    the three index rows are sliced inside the traced program, so the
    host pays ONE upload and ONE dispatch per call."""
    return pallas_partial_counts(
        lane_data1, lane_data2,
        stacked[0], stacked[1], stacked[2],
        chord2_table, **static,
    )


@partial(
    jax.jit,
    static_argnames=(
        "num_slots_out", "cols_binned", "interpret", "segment", "direct",
    ),
)
def _masked_segment_add(
    stacked, lo, lane_data1, tiles_t, thr, lane_data2, chord2_table, total,
    *,
    num_slots_out: int,
    cols_binned: bool,
    interpret: bool,
    segment: int,
    direct: tuple | None = None,
):
    """One masked kernel launch accumulated into the running total.

    ``lo`` is a traced offset into the stacked index arrays, so every
    segment of a multi-launch pair list reuses ONE compiled program (a
    static offset would compile per segment position). The row-side
    inputs (``tiles_t``, ``thr``) are precomputed ONCE by the caller —
    recomputing the full-tile-set transpose + gather per segment would
    redo O(tiles) work on every launch."""
    num_bins, num_table_cols = chord2_table.shape
    num_edges = _counting_width(num_table_cols, direct)
    tile_shape = tuple(lane_data1.shape[1:])
    kernel = _build_kernel_call(
        segment,
        tile_shape,
        num_slots_out,
        num_bins,
        num_edges,
        cols_binned,
        interpret,
        num_table_cols,
        direct,
    )
    idx = jax.lax.dynamic_slice(stacked, (0, lo), (3, segment))
    seg_slots = idx[2]
    part = kernel(
        idx[0], idx[1], seg_slots, lane_data1, tiles_t, thr, lane_data2
    )
    visited = jnp.zeros(num_slots_out, dtype=bool).at[seg_slots].set(True)
    return total + jnp.where(visited[:, None, None], part, 0.0)


def count_pairs_pallas(
    lane_data1: jnp.ndarray,
    lane_data2: jnp.ndarray,
    pairs: TilePairs,
    chord2_table: jnp.ndarray,
    *,
    cols_binned: bool,
    interpret: bool | None = None,
    max_pairs_per_call: int = MAX_PAIRS_PER_CALL,
    direct: tuple | None = None,
    padded_slots: bool = False,
) -> jnp.ndarray:
    """Run the Pallas pair-count kernel over a slot-sorted tile-pair list.

    Returns a float32 device array ``(num_slots, B, E)``. On non-TPU
    backends the kernel runs in interpreter mode (for testing). The output
    carries one extra trailing "dump" slot while counting (padding entries
    accumulate there) which is dropped before returning.

    With ``padded_slots=True`` the full BUCKETED slot axis is returned
    instead (``bucket_size(num_slots + 1)`` rows): downstream jitted
    consumers then see one compiled shape per bucket instead of one per
    distinct slot count. Rows at ``num_slots`` (the dump slot) and beyond
    carry dump counts, zeros, or — in the unmasked single-launch case —
    uninitialised HBM: callers MUST mask rows ``>= num_slots`` out
    themselves (a ``jnp.where`` on a host-built validity lane, never a
    multiply, which would propagate uninitialised NaNs).
    """
    num_slots = pairs.num_slots
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # fixed-size segments: pad with entries pointing at tile 0 and the
    # trailing dump slot (sorted order is preserved, the dump slot id is
    # larger than any real slot). The slot axis of the output is padded to
    # a bucketed size so the compiled program is reused across
    # measurements with different patch linkages.
    num_slots_out = bucket_size(num_slots + 1, base=64)
    segment = _grid_size(pairs.num_pairs, max_pairs_per_call)
    padded = -(-pairs.num_pairs // segment) * segment

    static = dict(
        num_slots_out=num_slots_out,
        cols_binned=cols_binned,
        interpret=interpret,
        segment=segment,
        direct=direct,
    )

    # upload the padded index arrays once, stacked into a single transfer
    # (each host->device transfer pays a full link round trip, which
    # dominates over a tunneled device link); per-segment slicing happens
    # on the device. The device array is cached on the (memoised) pair
    # list keyed by its padding geometry, so warm repeats and block-pair
    # revisits skip the pad + upload entirely.
    cache_key = ("stacked", padded, segment, num_slots)
    stacked = pairs._device_cache.get(cache_key)
    if stacked is None:
        tile1 = np.zeros(padded, dtype=np.int32)
        tile2 = np.zeros(padded, dtype=np.int32)
        slots = np.full(padded, num_slots, dtype=np.int32)
        tile1[: pairs.num_pairs] = pairs.tile1
        tile2[: pairs.num_pairs] = pairs.tile2
        slots[: pairs.num_pairs] = pairs.slot
        stacked = jnp.asarray(np.stack([tile1, tile2, slots]))
        pairs._device_cache[cache_key] = stacked

    if padded == segment:
        # the common single-launch case: when every real slot appears in
        # the pair list (checked on the host — the list is slot-sorted,
        # so distinct-count is one vectorised diff), the mask is skipped
        # entirely; garbage rows then live only at >= num_slots + 1 and
        # are sliced off. Slots with all tile pairs cap-pruned DO happen
        # (linked patch pair, no surviving tile pairs) and MUST be
        # masked: their output rows are never written and keep whatever
        # HBM memory XLA handed out.
        covered = pairs._device_cache.get("covered")
        if covered is None:
            real = pairs.slot
            covered = len(real) > 0 and (
                1 + int(np.count_nonzero(np.diff(real))) == num_slots
            )
            pairs._device_cache["covered"] = covered
        total = _partial_counts_stacked(
            lane_data1, lane_data2, stacked, chord2_table,
            **static, mask_always=not covered,
        )
        return total if padded_slots else total[:num_slots]

    total = jnp.zeros(
        (
            num_slots_out,
            chord2_table.shape[0],
            _counting_width(chord2_table.shape[1], direct),
        ),
        dtype=jnp.float32,
    )
    tiles_t, thr = row_side_inputs(lane_data1, chord2_table)
    for lo in range(0, padded, segment):
        total = _masked_segment_add(
            stacked, lo, lane_data1, tiles_t, thr, lane_data2,
            chord2_table, total, **static,
        )
    return total if padded_slots else total[:num_slots]
