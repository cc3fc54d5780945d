"""Pre-populated numpy buffers for this host's slow page faults.

MEASURED (this environment, single-core firecracker VM): anonymous
first-touch page faults cost ~6–150 µs EACH depending on the window, so
FIRST-TOUCH of a fresh 1 GB numpy buffer runs anywhere from 0.55 GB/s
down to ~27 MB/s (40 s!) while warmed memory writes at ~6 GB/s.  The
fix is ``MAP_POPULATE``: the kernel zeroes and maps every page inside
the one mmap syscall (~0.6 s/GB, no per-page user↔kernel round trips),
after which the first full write streams at ~5 GB/s regardless of the
fault-cost weather.

Rejected alternatives (measured here):
* ``MADV_HUGEPAGE`` + 1-byte-per-2MB prefault on ``mmap.mmap(-1, n)``
  — Python's anonymous mmap defaults to ``MAP_SHARED`` and madvise-mode
  THP only applies to PRIVATE anonymous VMAs, so this never created a
  single huge page (AnonHugePages stayed 0); the first fill still paid
  every 4 KB fault.
* ``MAP_PRIVATE`` + ``MADV_HUGEPAGE`` prefault — huge pages DO appear,
  but each 2 MB huge fault pays direct compaction (~25 ms!) on this
  VM: 12.9 s/GB to prefault, strictly worse than 4 KB faults.

The reference never hits this (its Rust buffers are reused in-process,
``crates/gravity/src/tree.rs:1443`` writes into caller-provided numpy
arrays); here the host-side prep/scatter allocates GBs per run, so the
allocator is load-bearing.
"""

from __future__ import annotations

import mmap
import sys

import numpy as np

__all__ = ["thp_empty", "thp_zeros", "thp_stage"]

_HUGE = 1 << 21  # 2 MB: below ~4 of these, plain np.empty is fine

_FLAGS = 0
if sys.platform.startswith("linux"):
    _FLAGS = mmap.MAP_PRIVATE | mmap.MAP_ANONYMOUS | getattr(
        mmap, "MAP_POPULATE", 0x8000)


def thp_empty(shape, dtype) -> np.ndarray:
    """np.empty equivalent backed by a pre-populated anonymous mapping.

    ``MAP_POPULATE`` faults in (and zeroes) every page inside the mmap
    syscall so the caller's first full write streams at memory speed
    instead of page-fault speed.  Falls back to ``np.empty`` off Linux /
    on tiny sizes / on mmap failure.  The mmap stays alive through the
    array's ``base`` chain.
    """
    dtype = np.dtype(dtype)
    nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
    if not _FLAGS or nbytes < (_HUGE * 4):
        return np.empty(shape, dtype)
    try:
        buf = mmap.mmap(-1, nbytes, flags=_FLAGS)
    except (OSError, ValueError):  # pragma: no cover
        return np.empty(shape, dtype)
    flat = np.frombuffer(buf, np.uint8)
    return flat.view(dtype)[: nbytes // dtype.itemsize].reshape(shape)


def thp_stage(arr: np.ndarray) -> np.ndarray:
    """Copy a file-mmap-backed array into a THP-backed anonymous buffer.

    Device uploads straight from a ``np.load(mmap_mode='r')`` array run at
    file-page-fault granularity through the relay (~9 MB/s measured: the
    324 MB 10M tile table took 34.7 s vs 4.6 s from a warm host buffer);
    a sequential memcpy into a pre-populated buffer reads the file at
    page-cache/readahead speed and the upload then streams at the normal
    host-buffer rate.  Non-memmap arrays are returned unchanged."""
    if not isinstance(arr, np.memmap):
        return arr
    out = thp_empty(arr.shape, arr.dtype)
    np.copyto(out, arr)
    return out


def thp_zeros(shape, dtype) -> np.ndarray:
    """np.zeros equivalent on a pre-populated buffer (anonymous mmap is
    zero-filled; MAP_POPULATE materializes the zeroed pages up front).
    Small buffers below the mmap threshold are np.zeros — callers such
    as the packed-tile builders rely on zeroed padding lanes."""
    dtype = np.dtype(dtype)
    nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
    if not _FLAGS or nbytes < (_HUGE * 4):
        return np.zeros(shape, dtype)
    return thp_empty(shape, dtype)
