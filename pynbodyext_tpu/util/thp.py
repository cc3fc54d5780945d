"""Transparent-hugepage-backed numpy buffers for this host's slow faults.

MEASURED (this environment, single-core firecracker VM): anonymous 4 KB
page faults cost ~150 µs each, so FIRST-TOUCH of a fresh 1 GB numpy
buffer runs at ~27 MB/s (40 s!) while warmed memory writes at ~6 GB/s.
THP is in ``madvise`` mode, and an mmap + ``madvise(MADV_HUGEPAGE)``
region faults 2 MB pages in ~20 µs: pre-faulting one byte per 2 MB takes
~10 ms/GB and the subsequent fill runs at ~1.4 GB/s — a ~50× speedup on
every large allocate-and-write (tile tables, far-class payload matrices,
eval scatter outputs).

The reference never hits this (its Rust buffers are reused in-process,
``crates/gravity/src/tree.rs:1443`` writes into caller-provided numpy
arrays); here the host-side prep/scatter allocates GBs per run, so the
allocator is load-bearing.
"""

from __future__ import annotations

import ctypes
import mmap
import sys

import numpy as np

__all__ = ["thp_empty", "thp_zeros"]

_MADV_HUGEPAGE = 14
_HUGE = 1 << 21  # 2 MB

_libc = None
if sys.platform.startswith("linux"):
    try:
        _libc = ctypes.CDLL("libc.so.6", use_errno=True)
    except OSError:  # pragma: no cover
        _libc = None


def thp_empty(shape, dtype) -> np.ndarray:
    """np.empty equivalent backed by a THP-madvised anonymous mapping.

    Pre-faults one byte per 2 MB so the caller's first full write streams
    at memory speed instead of page-fault speed.  Falls back to
    ``np.empty`` off Linux / on tiny sizes / on mmap failure.  The mmap
    stays alive through the array's ``base`` chain.
    """
    dtype = np.dtype(dtype)
    nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
    if _libc is None or nbytes < (_HUGE * 4):
        return np.empty(shape, dtype)
    try:
        buf = mmap.mmap(-1, nbytes)
    except (OSError, ValueError):  # pragma: no cover
        return np.empty(shape, dtype)
    addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
    _libc.madvise(ctypes.c_void_p(addr), ctypes.c_size_t(nbytes),
                  _MADV_HUGEPAGE)
    flat = np.frombuffer(buf, np.uint8)
    flat[::_HUGE] = 0  # pre-fault 2 MB pages (~10 ms/GB)
    return flat.view(dtype)[: nbytes // dtype.itemsize].reshape(shape)


def thp_zeros(shape, dtype) -> np.ndarray:
    """np.zeros equivalent on a THP-backed buffer (fresh mmap = zeroed;
    only the 2 MB pre-fault touches it, writing zeros)."""
    return thp_empty(shape, dtype)  # anonymous mmap is zero-filled
