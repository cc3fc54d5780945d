"""ctypes binding to the native octree library (csrc/octree.cpp).

Reference counterpart: the PyO3 binding crate ``crates/pynbodyext-rust``
(module ``pynbodyext._rust``).  The library auto-builds with g++ on first
import if missing or stale; computation releases the GIL implicitly (ctypes
releases it around foreign calls, matching the reference's
``release_gil``, ``gravity.rs:105``).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["lib", "ensure_built", "NativeError"]

_THIS = Path(__file__).resolve().parent
_REPO = _THIS.parent.parent.parent
_SRC = _REPO / "csrc" / "octree.cpp"
_HDRS = (_REPO / "csrc" / "multipole_tables.h",
         _REPO / "csrc" / "hilbert_tables.h")
_SO = _THIS / "libpnx_octree.so"


class NativeError(RuntimeError):
    pass


def ensure_built() -> Path:
    """Compile the shared library if missing or older than its sources."""
    if _SO.exists() and _SRC.exists():
        src_mtime = max([_SRC.stat().st_mtime]
                        + [h.stat().st_mtime for h in _HDRS if h.exists()])
        if _SO.stat().st_mtime >= src_mtime:
            return _SO
    if not _SRC.exists():
        if _SO.exists():
            return _SO
        raise NativeError(f"native source not found: {_SRC}")
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
           "-o", str(_SO), str(_SRC), "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True,
                       cwd=str(_SRC.parent))
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeError(f"failed to build native octree: {detail}") from e
    return _SO


def _load() -> Optional[ctypes.CDLL]:
    try:
        path = ensure_built()
    except NativeError:
        return None
    dll = ctypes.CDLL(str(path))
    dp = ctypes.POINTER(ctypes.c_double)
    dll.pnx_tree_build.restype = ctypes.c_void_p
    dll.pnx_tree_build.argtypes = [dp, ctypes.c_long, dp, ctypes.c_long,
                                   ctypes.c_int, dp, ctypes.c_int,
                                   ctypes.c_int]
    dll.pnx_tree_free.argtypes = [ctypes.c_void_p]
    dll.pnx_tree_n_nodes.restype = ctypes.c_long
    dll.pnx_tree_n_nodes.argtypes = [ctypes.c_void_p]
    common = [ctypes.c_void_p, dp, ctypes.c_long, ctypes.c_int, dp,
              ctypes.c_double, ctypes.c_int, dp]
    dll.pnx_tree_potentials.argtypes = common
    dll.pnx_tree_accelerations.argtypes = common
    direct = [dp, ctypes.c_long, dp, dp, ctypes.c_int, dp, ctypes.c_long,
              ctypes.c_int, dp, ctypes.c_int, dp]
    dll.pnx_direct_potentials.argtypes = direct
    dll.pnx_direct_accelerations.argtypes = direct
    lp = ctypes.POINTER(ctypes.c_long)
    ip = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    dll.pnx_tree_build_block_lists.restype = ctypes.c_long
    dll.pnx_tree_build_block_lists.argtypes = [ctypes.c_void_p,
                                               ctypes.c_long,
                                               ctypes.c_double]
    dll.pnx_tree_block_list_sizes.argtypes = [ctypes.c_void_p, lp, lp]
    dll.pnx_tree_block_list_data.argtypes = [ctypes.c_void_p, ip, ip]
    dll.pnx_tree_block_targets.argtypes = [ctypes.c_void_p, ip, ip]
    dll.pnx_tree_build_group_lists.restype = ctypes.c_long
    dll.pnx_tree_build_group_lists.argtypes = [ctypes.c_void_p,
                                               ctypes.c_long,
                                               ctypes.c_double]
    dll.pnx_tree_group_list_sizes.argtypes = [ctypes.c_void_p, lp, lp, lp]
    dll.pnx_tree_group_targets.argtypes = [ctypes.c_void_p, ip, ip]
    dll.pnx_tree_group_list_data.argtypes = [ctypes.c_void_p, ip, ip, ip]
    dll.pnx_tree_group_near_sizes.argtypes = [ctypes.c_void_p, lp]
    dll.pnx_tree_group_near_data.argtypes = [ctypes.c_void_p, ip, ip]
    dll.pnx_tree_n_leaves.restype = ctypes.c_long
    dll.pnx_tree_n_leaves.argtypes = [ctypes.c_void_p]
    dll.pnx_tree_leaves.argtypes = [ctypes.c_void_p, ip, ip]
    dll.pnx_tree_point_leaves.argtypes = [ctypes.c_void_p, dp,
                                          ctypes.c_long, ip]
    dll.pnx_tree_node_data.argtypes = [ctypes.c_void_p, dp, dp, dp]
    dll.pnx_tree_moments.argtypes = [ctypes.c_void_p, dp]
    dll.pnx_tree_nmom.restype = ctypes.c_int
    dll.pnx_tree_nmom.argtypes = [ctypes.c_void_p]
    dll.pnx_tree_particles.argtypes = [ctypes.c_void_p, dp, dp, dp, i64p]
    fp = ctypes.POINTER(ctypes.c_float)
    dll.pnx_tree_pack_leaf_tiles.argtypes = [ctypes.c_void_p, i64p, i64p,
                                             ctypes.c_long, dp,
                                             ctypes.c_long, fp]
    dll.pnx_gather_payload_t.argtypes = [fp, ip, i64p, i64p,
                                         ctypes.c_long, ctypes.c_long,
                                         ctypes.c_long, ctypes.c_int64, fp]
    dll.pnx_pad_lists_i32.argtypes = [ip, i64p, i64p, ctypes.c_long,
                                      ctypes.c_long, ctypes.c_int32, ip]
    return dll


lib = _load()


def as_f64(a, shape=None) -> np.ndarray:
    out = np.ascontiguousarray(a, dtype=np.float64)
    if shape is not None and out.shape != shape:
        raise ValueError(f"expected shape {shape}, got {out.shape}")
    return out


def dptr(a: Optional[np.ndarray]):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
