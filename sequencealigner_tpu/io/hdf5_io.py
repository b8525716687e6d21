"""HDF5 output writer, schema-compatible with the reference
(/root/reference/src/io/format/hdf5.c):

- file created with latest libver bounds and 4 KiB alignment (hdf5.c:16-19)
- dataset ``/sequences``: 1-D variable-length C strings (hdf5.c:28-53)
- dataset ``/similarity_matrix``: N x N H5T_STD_I32LE, square-chunked by the
  reference's doubling heuristic, optional gzip 0..9 (hdf5.c:60-92)
- triangular stores are converted row-chunk-wise so the full matrix never
  needs to exist in RAM (hdf5.c:114-196)
"""

from __future__ import annotations

import numpy as np

from .. import system, ui
from .input import SequenceSet
from .output import OutputStore

H5_MAX_CHUNK = 4096
H5_MIN_CHUNK = 256


def chunk_dim(dim: int, compression: int) -> int | None:
    """The reference's chunk-size heuristic (hdf5.c:70-89).  Returns None for
    contiguous layout (dim <= 256).  Note the reference computes ``square``
    once from the initial chunk (64*64*8 bytes) and never updates it in the
    loop, so the loop effectively doubles until chunk >= dim; we reproduce the
    resulting sizes exactly."""
    if dim <= H5_MIN_CHUNK:
        return None
    chunk = 64
    square = chunk * chunk * 8
    target = (2 << 20) // (1 + compression // 3)
    while chunk < dim and square < target:
        chunk *= 2
    if chunk > dim or square > target:
        chunk //= 2
    return min(max(chunk, H5_MIN_CHUNK), H5_MAX_CHUNK, dim)


def write(
    path: str,
    store: OutputStore,
    seqs: SequenceSet,
    *,
    compression: int = 0,
    progress: bool = True,
    max_rows: int | None = None,
) -> None:
    """max_rows limits the triangular->square conversion to a leading row
    window (scale benchmarking); the dataset is still created full-size."""
    import h5py

    dim = store.dim
    with h5py.File(
        path,
        "w",
        libver="latest",
        alignment_threshold=H5_MAX_CHUNK,
        alignment_interval=H5_MAX_CHUNK,
    ) as f:
        ui.pinfo("Writing %d sequences to HDF5", dim)
        str_dt = h5py.string_dtype(encoding="ascii")
        f.create_dataset(
            "/sequences",
            data=[seqs.get_bytes(i) for i in range(dim)],
            dtype=str_dt,
        )

        cdim = chunk_dim(dim, compression)
        kwargs = {}
        if cdim is not None:
            kwargs["chunks"] = (cdim, cdim)
            ui.pverb("HDF5 chunk size: %d x %d", cdim, cdim)
            if compression:
                kwargs["compression"] = "gzip"
                kwargs["compression_opts"] = compression
        dset = f.create_dataset(
            "/similarity_matrix", shape=(dim, dim), dtype="<i4", **kwargs
        )

        lim = dim if max_rows is None else min(dim, max_rows)
        if not store.triangular:
            ui.pinfo("Writing Similarity Matrix to HDF5")
            dset[:lim] = np.asarray(store.matrix).reshape(dim, dim)[:lim]
            return

        ui.pinfo("Writing triangular Similarity Matrix to HDF5")
        # Row-chunk size bounded by RAM, like hdf5.c:124-129.
        avail = system.available_memory()
        row_bytes = dim * 4
        ram_rows = int(avail // (4 * row_bytes)) if row_bytes else dim
        chunk_rows = max(cdim or 4, 4)
        if chunk_rows > ram_rows > 4:
            chunk_rows = ram_rows
        bar = ui.Progress(lim, "Converting to HDF5") if progress else None
        if store.pos is not None:
            # Sorted-coordinate spill layout: stream the packed triangle in
            # SORTED windows (two sequential passes total — see
            # OutputStore.rows_sorted_window) and write each window's rows
            # at their original-index positions.  max_rows (benchmarking)
            # bounds the number of sorted rows converted.
            w = min(max(chunk_rows, 256), max(ram_rows, 4), 4096)
            for off in range(0, lim, w):
                end = min(off + w, lim)
                targets, block = store.rows_sorted_window(off, end)
                dset[targets] = block
                if bar:
                    bar.add(end - off)
            if bar:
                bar.end()
            return
        for off in range(0, lim, chunk_rows):
            end = min(off + chunk_rows, lim)
            dset[off:end, :] = store.rows(off, end)
            if bar:
                bar.add(end - off)
        if bar:
            bar.end()
