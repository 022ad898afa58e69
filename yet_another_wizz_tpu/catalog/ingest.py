"""Bounded-memory streaming ingestion of large catalogs.

Capability parity with the reference's parallel ingestion pipeline
(/root/reference/src/yaw/catalog/catalog.py:587-908): file chunks are
streamed through patch assignment into per-patch cache writers, so the
peak memory footprint is one chunk (default 16.7M rows) regardless of
catalog size. The reference farms this over MPI ranks with a dedicated
writer process; here the chunk pipeline is sequential on the host while
the patch assignment of each chunk runs on the device (a matmul argmax),
which dominates the arithmetic.

Used by :meth:`Catalog.from_file` when ``streaming=True`` (automatic for
inputs larger than one chunk).
"""

from __future__ import annotations

import logging
import queue
import threading
from pathlib import Path
from typing import TYPE_CHECKING

import numpy as np

from yet_another_wizz_tpu.catalog.patch import (
    Metadata,
    PatchWriter,
)
from yet_another_wizz_tpu.coordinates import AngularCoordinates, radec_to_xyz
from yet_another_wizz_tpu.datachunk import DataChunk
from yet_another_wizz_tpu.ops.kmeans import assign_patches, kmeans_patch_centers

if TYPE_CHECKING:
    from numpy.typing import NDArray

    from yet_another_wizz_tpu.catalog.readers import BaseReader

__all__ = [
    "resolve_patch_centers",
    "write_patches_collective",
    "write_patches_streaming",
]

logger = logging.getLogger(__name__)

PATCH_NAME_TEMPLATE = "patch_{:}"

COLLECTIVE_BROADCAST_ROWS = 1_048_576
"""Row cap per collective-ingestion broadcast round (~40 MB of columns):
the pod-wide broadcast stages its payload through device memory."""


def _applied_center(centers_xyz, pid: int):
    """The center that assigned patch ``pid`` as AngularCoordinates, or
    None (patch-id-column mode) to fall back to the weighted mean —
    recorded in meta.yml so caches preserve the applied centers like the
    reference (/root/reference/src/yaw/catalog/patch.py:104-146)."""
    if centers_xyz is None:
        return None
    return AngularCoordinates.from_3d(
        np.asarray(centers_xyz, dtype=np.float64)[pid : pid + 1]
    )


def _assign_from_radec(ra, dec, centers_xyz) -> NDArray:
    """Nearest-center ids from ra/dec columns.

    Host-sized problems run the FUSED native kernel straight off the
    (strided) structured-array columns — no ``(n, 3)`` xyz temporary and
    no contiguity copies, bit-identical ids to the unfused pair; larger
    problems and native-less hosts fall back to
    ``assign_patches(radec_to_xyz(...))``."""
    from yet_another_wizz_tpu import _native
    from yet_another_wizz_tpu.ops.kmeans import DEVICE_ASSIGN_THRESHOLD

    if (
        _native.NATIVE_ENABLED
        and len(ra) * len(centers_xyz) < DEVICE_ASSIGN_THRESHOLD
    ):
        return _native.assign_patches_radec(ra, dec, centers_xyz)
    return assign_patches(radec_to_xyz(ra, dec), centers_xyz)


def _chunk_patch_ids(chunk, centers_xyz):
    """Patch ids for one streamed chunk, with the same source priority as
    the in-memory path (_resolve_patch_assignment): explicit centers beat
    a patch-id column carried by the file. Returns the chunk (patch-id
    column removed if present) and the ids."""
    column_ids = DataChunk.getattr(chunk, "patch_ids")
    if column_ids is not None:
        chunk, _ = DataChunk.pop(chunk, "patch_ids")
    if centers_xyz is not None:
        return chunk, _assign_from_radec(
            chunk["ra"], chunk["dec"], centers_xyz
        )
    if column_ids is None:
        raise ValueError(
            "chunk provides no patch ids and no centers are set"
        )
    return chunk, column_ids


def _split_by_patch(chunk, patch_ids):
    """Sort a chunk by patch id, split into per-patch parts (shared by the
    streaming and the collective writer — one copy of the splitting and
    its validation).

    Negative ids are rejected: the caches and the count tensors require
    contiguous ids ``0..P-1`` — a file using ``-1`` as an "unassigned"
    sentinel would otherwise silently write a ``patch_-1`` cache
    directory and feed out-of-range ids to the native geometry kernels.

    Returns ``(splits, sorted_ids)`` where ``splits`` is a list of
    ``(patch_id, rows)`` pairs."""
    if len(patch_ids) and int(np.min(patch_ids)) < 0:
        raise ValueError(
            "'patch_ids' must be non-negative (contiguous 0..P-1; "
            "drop or reassign sentinel ids before ingestion)"
        )
    from yet_another_wizz_tpu import _native

    if (
        _native.NATIVE_ENABLED
        and len(patch_ids)
        and chunk.flags["C_CONTIGUOUS"]
    ):
        # one parallel counting-sort pass replaces argsort + the (slow,
        # single-threaded) structured-row fancy index + unique(); the
        # stable order is identical to np.argsort(kind="stable")
        num_ids = int(np.max(patch_ids)) + 1
        order, counts = _native.counting_argsort_ids(patch_ids, num_ids)
        sorted_chunk = _native.gather_rows(chunk, order)
        sorted_ids = patch_ids[order]
        present = np.flatnonzero(counts)
        stops = np.cumsum(counts[present])
        splits = [
            (int(pid), sorted_chunk[stop - counts[pid] : stop])
            for pid, stop in zip(present, stops)
        ]
        return splits, sorted_ids
    order = np.argsort(patch_ids, kind="stable")
    sorted_ids = patch_ids[order]
    sorted_chunk = chunk[order]
    unique, first = np.unique(sorted_ids, return_index=True)
    splits = [
        (int(pid), part)
        for pid, part in zip(unique, np.split(sorted_chunk, first[1:]))
    ]
    return splits, sorted_ids


def resolve_patch_centers(
    reader: BaseReader,
    *,
    patch_centers=None,
    patch_num: int | None = None,
    probe_size: int = 500_000,
) -> NDArray | None:
    """Patch centers as unit vectors: use the given ones, or generate them
    with kmeans on a sparse probe of the input (None when the input
    provides its own patch-id column)."""
    if patch_centers is not None:
        from yet_another_wizz_tpu.catalog.catalog import Catalog

        if isinstance(patch_centers, Catalog):
            return patch_centers.get_centers().to_3d()
        if isinstance(patch_centers, AngularCoordinates):
            return patch_centers.to_3d()
        centers = np.asarray(patch_centers, dtype=np.float64)
        # same validation as the in-memory path
        # (catalog._resolve_patch_assignment): a malformed array would
        # mis-stride the native assignment kernel silently
        if centers.ndim != 2 or centers.shape[1] not in (2, 3):
            raise ValueError(
                "'patch_centers' must be AngularCoordinates, a Catalog, "
                "or an array of shape (P, 2) radian / (P, 3) unit vectors"
            )
        if centers.shape[1] == 2:
            return radec_to_xyz(centers[:, 0], centers[:, 1])
        return centers

    if patch_num is None:
        return None

    logger.info(
        "computing %d patch centers from a %d-row probe",
        patch_num,
        min(probe_size, reader.num_records),
    )
    probe = reader.get_probe(probe_size)
    xyz = radec_to_xyz(probe["ra"], probe["dec"])
    weights = DataChunk.getattr(probe, "weights")
    return kmeans_patch_centers(xyz, patch_num, weights=weights)


def write_patches_streaming(
    reader: BaseReader,
    cache_directory: Path | str | None,
    centers_xyz: NDArray | None,
    *,
    overwrite: bool = False,
    buffersize: int | None = None,
    progress: bool = False,
    keep_data: bool = False,
) -> "tuple[int, tuple[NDArray, NDArray] | None]":
    """Stream a chunked reader through patch assignment.

    Per chunk: assign patch ids (device matmul against the centers, unless
    the chunk carries a patch-id column) and split the chunk by patch. With
    a ``cache_directory`` the splits are appended to buffered per-patch
    writers on disk; with ``keep_data`` they are additionally assembled
    in memory (patch-major, chunk-arrival order within each patch — byte
    identical to reading the cache back) so the caller can construct the
    catalog directly without the cache round trip. ``cache_directory=None``
    requires ``keep_data`` and skips disk entirely.

    Returns ``(num_patches, assembled)`` where ``assembled`` is None or a
    ``(chunk, patch_ids)`` pair.
    """
    if cache_directory is None and not keep_data:
        raise ValueError("either a cache_directory or keep_data is required")
    cache = None
    if cache_directory is not None:
        from yet_another_wizz_tpu.catalog.catalog import (
            prepare_cache_directory,
        )

        cache = Path(cache_directory)
        prepare_cache_directory(cache, overwrite)

    from yet_another_wizz_tpu.catalog.readers import prefetch_chunks

    writers: dict[int, PatchWriter] = {}
    parts: dict[int, list[NDArray]] = {}
    chunk_iter = prefetch_chunks(reader)
    if progress:
        from yet_another_wizz_tpu.utils.logging import Indicator

        chunk_iter = Indicator(chunk_iter, reader.num_chunks)

    kwargs = {} if buffersize is None else dict(buffersize=buffersize)
    num_expected = 0 if centers_xyz is None else len(centers_xyz)

    # producer/writer overlap: reading + patch assignment of the next
    # chunk proceeds while the previous chunk's patch splits are written
    # (the single-writer-role discipline of the reference's pipeline,
    # /root/reference/src/yaw/catalog/catalog.py:655-673)
    work: queue.Queue = queue.Queue(maxsize=2)
    writer_error: list[BaseException] = []

    def writer_task() -> None:
        while True:
            item = work.get()
            if item is None:
                return
            try:
                info, splits = item
                for pid, part in splits:
                    if keep_data:
                        parts.setdefault(pid, []).append(part)
                    if cache is None:
                        continue
                    if pid not in writers:
                        writers[pid] = PatchWriter(
                            cache / PATCH_NAME_TEMPLATE.format(pid),
                            info,
                            **kwargs,
                        )
                    writers[pid].process_chunk(part)
            except BaseException as err:  # propagated to the producer
                writer_error.append(err)
                return
            finally:
                work.task_done()

    writer = threading.Thread(target=writer_task, daemon=True)
    writer.start()

    try:
        for chunk in chunk_iter:
            chunk, patch_ids = _chunk_patch_ids(chunk, centers_xyz)
            splits, sorted_ids = _split_by_patch(chunk, patch_ids)
            if writer_error:
                raise writer_error[0]
            work.put((DataChunk.get_info(chunk), splits))
            if len(sorted_ids):
                num_expected = max(num_expected, int(sorted_ids[-1]) + 1)
    finally:
        # the writer thread may already be dead (error) with the queue
        # full; a blocking put would then hang forever and swallow the
        # real failure. Only drain pending items once the writer stopped
        # consuming — on the success path they are real chunks it still
        # has to process.
        while True:
            try:
                work.put(None, timeout=0.1)
                break
            except queue.Full:
                if writer_error or not writer.is_alive():
                    try:
                        work.get_nowait()
                    except queue.Empty:
                        pass
        writer.join()
    if writer_error:
        raise writer_error[0]

    seen = parts if keep_data else writers
    missing = [pid for pid in range(num_expected) if pid not in seen]
    if missing:
        raise ValueError(f"patches with no data: {missing}")
    num_patches = len(seen)

    assembled = None
    if keep_data:
        # patch-major assembly in writer-append order: byte-identical to
        # reading the finalized cache back
        patch_arrays = [
            np.concatenate(parts[pid]) if len(parts[pid]) > 1 else parts[pid][0]
            for pid in range(num_patches)
        ]
        patch_ids = np.repeat(
            np.arange(num_patches, dtype=np.int32),
            [len(arr) for arr in patch_arrays],
        )
        assembled = (np.concatenate(patch_arrays), patch_ids)

    from yet_another_wizz_tpu.catalog.patch import read_patch_data

    for pid, patch_writer in writers.items():
        patch_writer.finalize()
        # compute and store metadata now so reopening the cache is cheap
        # (from the in-memory patch data when available, avoiding a full
        # disk re-read of the catalog)
        if keep_data:
            data = patch_arrays[pid]
        else:
            _, data = read_patch_data(patch_writer.data_path)
        meta = Metadata.compute(
            DataChunk.get_coords(data),
            weights=DataChunk.getattr(data, "weights"),
            center=_applied_center(centers_xyz, pid),
        )
        meta.to_file(patch_writer.cache_path / "meta.yml")

    if cache is not None:
        from yet_another_wizz_tpu.catalog.catalog import write_patch_ids_file

        write_patch_ids_file(cache, num_patches)

    logger.info(
        "streamed %d patches (%s records)%s",
        num_patches,
        reader.num_records,
        " to cache" if cache is not None else " in memory",
    )
    return num_patches, assembled


def write_patches_collective(
    reader: BaseReader,
    cache_directory: Path | str,
    centers_xyz: NDArray | None,
    *,
    overwrite: bool = False,
    progress: bool = False,
    buffersize: int | None = None,
) -> int:
    """Multi-process streaming ingestion over a pod.

    The root process streams the reader through patch assignment and
    broadcasts each chunk's patch splits; every process writes only the
    patches it owns (``pid % num_processes``), so buffered cache writing,
    metadata computation and file I/O parallelise across the hosts — the
    analogue of the reference's reader/writer MPI rank split
    (/root/reference/src/yaw/catalog/catalog.py:587-908). All processes
    must share the cache filesystem.

    Error discipline: root-side reader errors are broadcast in-stream and
    re-raised everywhere; writer errors on any rank are kept local until
    the final status exchange (the rank keeps draining the stream so the
    collective stays in sync), then re-raised on every process.

    Returns the number of patches.
    """
    from yet_another_wizz_tpu.parallel import distributed as dist

    num_procs = dist.num_processes()
    rank = dist.process_index()
    cache = Path(cache_directory)

    def prepare_cache() -> None:
        from yet_another_wizz_tpu.catalog.catalog import (
            prepare_cache_directory,
        )

        prepare_cache_directory(cache, overwrite)

    dist.run_on_root(prepare_cache)

    from yet_another_wizz_tpu.catalog.readers import prefetch_chunks

    writers: dict[int, PatchWriter] = {}
    kwargs = {} if buffersize is None else dict(buffersize=buffersize)
    local_error: BaseException | None = None
    num_patches = 0

    def write_owned(info, splits) -> None:
        nonlocal local_error
        if local_error is not None:
            return  # stay in sync but stop touching the filesystem
        try:
            for pid, part in splits:
                if pid % num_procs != rank:
                    continue
                if pid not in writers:
                    writers[pid] = PatchWriter(
                        cache / PATCH_NAME_TEMPLATE.format(pid),
                        info,
                        **kwargs,
                    )
                writers[pid].process_chunk(part)
        except BaseException as err:
            local_error = err

    # bound the per-round collective payload: dist.broadcast stages the
    # pickled splits through device memory (multihost_utils), so a full
    # default-sized chunk (16.7M rows) would allocate ~GB on every
    # process per round; row-capped sub-chunks keep each round ~tens of MB
    max_rows = COLLECTIVE_BROADCAST_ROWS

    def bounded(chunks):
        for chunk in chunks:
            for lo in range(0, len(chunk), max_rows):
                yield chunk[lo : lo + max_rows]

    if dist.on_root():
        num_expected = 0 if centers_xyz is None else len(centers_xyz)
        seen: set[int] = set()
        chunk_iter = bounded(prefetch_chunks(reader))
        if progress:
            from yet_another_wizz_tpu.utils.logging import Indicator

            # exact round count: full chunks plus the (shorter) last one
            full = max(0, reader.num_chunks - 1)
            last_rows = reader.num_records - full * reader.chunksize
            total = full * max(1, -(-reader.chunksize // max_rows)) + max(
                1, -(-last_rows // max_rows)
            )
            chunk_iter = Indicator(chunk_iter, total)
        root_error: BaseException | None = None
        try:
            for chunk in chunk_iter:
                chunk, patch_ids = _chunk_patch_ids(chunk, centers_xyz)
                splits, sorted_ids = _split_by_patch(chunk, patch_ids)
                seen.update(pid for pid, _ in splits)
                if len(sorted_ids):
                    num_expected = max(
                        num_expected, int(sorted_ids[-1]) + 1
                    )
                info = DataChunk.get_info(chunk)
                dist.broadcast(("chunk", info, splits))
                write_owned(info, splits)
            missing = sorted(set(range(num_expected)) - seen)
            if missing:
                raise ValueError(f"patches with no data: {missing}")
        except BaseException as err:
            root_error = err
        if root_error is not None:
            # every rank (root included) raises and skips the final
            # status exchange — the stream is the last collective then
            dist.broadcast(
                ("error", dist.picklable_exception(root_error))
            )
            raise root_error
        dist.broadcast(("done", num_expected))
        num_patches = num_expected
    else:
        while True:
            message = dist.broadcast(None)
            if message[0] == "chunk":
                _, info, splits = message
                write_owned(info, splits)
            elif message[0] == "done":
                num_patches = message[1]
                break
            else:  # root failed mid-stream; all ranks raise collectively
                raise message[1]

    if local_error is None:
        try:
            from yet_another_wizz_tpu.catalog.patch import read_patch_data

            for pid, patch_writer in writers.items():
                patch_writer.finalize()
                _, data = read_patch_data(patch_writer.data_path)
                meta = Metadata.compute(
                    DataChunk.get_coords(data),
                    weights=DataChunk.getattr(data, "weights"),
                    center=_applied_center(centers_xyz, pid),
                )
                meta.to_file(patch_writer.cache_path / "meta.yml")
            if rank == 0:
                from yet_another_wizz_tpu.catalog.catalog import (
                    write_patch_ids_file,
                )

                write_patch_ids_file(cache, num_patches)
        except BaseException as err:
            local_error = err

    # per-rank status exchange: everyone learns about everyone's errors
    # (and implicitly synchronises on the completed cache)
    failures = []
    for source in range(num_procs):
        payload = None
        if rank == source and local_error is not None:
            payload = dist.picklable_exception(local_error)
        status = dist.broadcast(payload, is_source=rank == source)
        if status is not None:
            failures.append((source, status))
    if failures:
        source, first = failures[0]
        raise RuntimeError(
            f"collective ingestion failed on process {source}"
        ) from first

    logger.info(
        "streamed %d patches (%s records) to cache over %d processes",
        num_patches,
        reader.num_records,
        num_procs,
    )
    return num_patches
