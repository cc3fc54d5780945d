"""Persistent device-tree prep cache: skip the host-side tree build.

At 10M particles the octree build + interaction-list construction + class
building runs ~2.5 minutes on the (single-core) host while the device
solve itself is tens of seconds.  The reference pays an analogous (if
smaller) build cost on every run and only ever keeps the tree in process
memory (``pynbodyext/gravity/base.py:174-238`` lazy cached tree;
``crates/pynbodyext-rust/src/gravity.rs:13-31`` times the build as a
first-class stage).  Here the *entire prep* — interaction lists, packed
tile tables, window structures, pre-gathered far payloads — is a pure
function of (particle content, tree params, θ, engine caps), so it can be
persisted across processes and reloaded at disk bandwidth.

Design:

* fingerprint = content hash of (pos, mass, softenings) via head/tail/
  strided samples + whole-array reductions (the :mod:`...core.calculate.
  diskcache` discipline) + all structural parameters;
* the prep dict is pickled with device arrays converted to host numpy and
  tagged, so loading can re-upload exactly the entries that lived in HBM;
* device-side derived caches that are cheap reshapes (blocked tile views)
  are dropped and rebuilt lazily;
* lazily-built engine structures (packed tiles, banded windows) are
  included when present — ``refresh_tree_prep_cache(prep)`` after the
  first solve re-saves the file when new structures appeared, so the
  second process skips even those builds.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path
from typing import Any, Optional, Tuple

import numpy as np

from ..log import logger

__all__ = ["tree_prep_fingerprint", "save_tree_prep", "load_tree_prep",
           "cached_prepare_tree_pallas", "refresh_tree_prep_cache"]

#: prep keys never persisted.  Device-resident structures are all
#: rebuildable from the compact host ingredients that ARE persisted
#: (_tiles_np, _far_lists, _payload_np, near lists, packed ranges) — and
#: downloading them through the relay measured ~20-40 MB/s (a 10M save
#: was 329 s), while the host-side rebuild is seconds.  The loader
#: re-uploads the tile table; drivers lazily rebuild classes/windows.
_SKIP_PREFIXES = ("tiles_blk", "ptiles_blk", "tgt_blk", "banded", "pwin",
                  "diag", "farinv", "gfarinv")
_SKIP_KEYS = {"_tree", "_gtt_np", "gtt_tiles", "far_classes",
              "gfar_classes", "tiles", "tgt_tiles", "tgt_pos",
              "_payload_dev",  # rebuilt from _payload_np on first use
              "near_classes", "gnear_classes",
              # device gather indices for the on-device leg combine —
              # rebuilt per process (host rebuild is two cheap scatters;
              # persisting would hand numpy mmaps to the jitted combine,
              # re-uploading ~80 MB per eval at 10M)
              "_combine_idx",
              # in-flight background warm thread (load_tree_prep)
              "_warm_future", "_tiles_ready"}

_FORMAT_VERSION = 7  # v7: compact _part_mat replaces _tiles_np in the pickle


def _hash_array(h, arr) -> None:
    arr = np.asarray(arr)
    h.update(f"{arr.shape}:{arr.dtype}".encode())
    flat = arr.reshape(-1)
    n = flat.shape[0]
    h.update(flat[:16].tobytes())
    h.update(flat[-16:].tobytes())
    if n > 32:
        stride = max(1, n // 64)
        h.update(flat[::stride][:64].tobytes())
    if n and np.issubdtype(arr.dtype, np.number):
        h.update(np.asarray([float(flat.sum()), float(flat.min()),
                             float(flat.max())], np.float64).tobytes())


def tree_prep_fingerprint(pos, mass, softenings, *, leaf_capacity: int,
                          multipole_order: int, kernel, theta: float,
                          group_leaves: int, cap: int) -> str:
    """Content + parameter identity of a device-tree prep."""
    h = hashlib.sha1()
    h.update(f"v{_FORMAT_VERSION}:{leaf_capacity}:{multipole_order}:"
             f"{kernel}:{theta:.10g}:{group_leaves}:{cap}".encode())
    _hash_array(h, pos)
    if mass is not None:
        _hash_array(h, np.asarray(mass))
    if softenings is not None:
        _hash_array(h, np.asarray(softenings))
    return h.hexdigest()[:24]


def _is_device_array(v) -> bool:
    return (hasattr(v, "shape") and hasattr(v, "dtype")
            and not isinstance(v, np.ndarray))


class _Dev:
    """Pickle tag: this payload lived in HBM — re-upload on load."""
    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = arr


class _Ext:
    """Pickle tag: large array stored as a sidecar ``.npy``, memory-mapped
    on load.  pickle.load copies every byte into freshly-faulted pages
    (~150 µs per 4 KB on this host — the round-3 warm reload spent ~100 s
    there); ``np.load(mmap_mode='r')`` costs nothing until a consumer
    streams the pages, and a device upload reads them once at page-cache
    / disk-readahead speed."""
    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name


#: arrays at or above this size go to the sidecar dir instead of the pickle
_EXT_THRESHOLD = 4 * 2**20


def _encode(v: Any, sink) -> Any:
    if _is_device_array(v):
        return _Dev(_encode(np.asarray(v), sink))
    if isinstance(v, np.ndarray) and v.nbytes >= _EXT_THRESHOLD and sink \
            is not None:
        name = f"a{len(sink)}.npy"
        sink.append((name, v))
        return _Ext(name)
    if isinstance(v, tuple):
        return tuple(_encode(x, sink) for x in v)
    if isinstance(v, list):
        return [_encode(x, sink) for x in v]
    if isinstance(v, dict):
        return {k: _encode(x, sink) for k, x in v.items()}
    return v


def _decode(v: Any, extdir) -> Any:
    import jax.numpy as jnp

    from ..util.thp import thp_stage
    if isinstance(v, _Dev):
        # uploads from a file mmap measured ~9 MB/s through the relay —
        # stage sidecar-backed payloads through a THP buffer first
        return jnp.asarray(thp_stage(_decode(v.arr, extdir)))
    if isinstance(v, _Ext):
        return np.load(extdir / v.name, mmap_mode="r")
    if isinstance(v, tuple):
        return tuple(_decode(x, extdir) for x in v)
    if isinstance(v, list):
        return [_decode(x, extdir) for x in v]
    if isinstance(v, dict):
        return {k: _decode(x, extdir) for k, x in v.items()}
    return v


def _persistable(prep: dict) -> dict:
    out = {}
    has_pm = prep.get("_part_mat") is not None
    # snapshot: a background class-build thread may be inserting keys
    for k, v in list(prep.items()):
        if k in _SKIP_KEYS:
            continue
        if k == "_tiles_np" and has_pm:
            continue  # derivable on device from the particle matrix
        if isinstance(k, tuple) and k and k[0] in _SKIP_PREFIXES:
            continue
        if isinstance(k, tuple) and k and k[0] == "packed":
            # keep the packer's ranges; the device table is rebuilt by a
            # device gather from the resident leaf tiles on first use
            v = {kk: vv for kk, vv in v.items()
                 if kk not in ("ptiles", "ptiles_np")}
        out[k] = v
    return out


def save_tree_prep(prep: dict, path) -> bool:
    """Persist a prep dict (host artifacts only — device structures are
    rebuilt on load).  Returns False (and logs) on any IO failure —
    caching is best-effort."""
    path = Path(path)
    try:
        if "_part_mat" in prep:
            # compact-matrix preps: persist the (n+1, 6) particle matrix
            # and rebuild the tile table on device at load — never
            # materialize (or ship) the 324 MB host table
            if prep.get("_part_mat") is None:
                from .tree_tpu import _part_matrix
                _part_matrix(prep)
        elif prep.get("_tiles_np") is None:
            from .tree_tpu import _host_tiles
            _host_tiles(prep)  # materialize the host table for the pickle
        if prep.get("_particles") is None and prep.get("_tree") is not None:
            # a release_host_buffers'd prep still holds the tree — rebuild
            # the tree-order particle arrays so the pickle is
            # self-contained (the packed/diag engines repack device tiles
            # from them on reload)
            from .tree_tpu import _host_particles
            _host_particles(prep)
        body = _persistable(prep)
    except Exception as e:
        # best-effort contract: a released prep (host buffers freed) or a
        # failed rebuild must not escape — caching just doesn't happen
        logger.warning("tree prep cache: save skipped (%s)", e)
        return False
    try:
        path.parent.mkdir(parents=True, exist_ok=True)
        sink: list = []
        enc = _encode(body, sink)
        # sidecar dir first (np.save streams straight from the arrays —
        # no pickle memcpy), then the pickle: a load that finds the pickle
        # always finds its sidecars; a crash in between leaves the old
        # pickle pointing at the old (still complete) dir or a fresh dir
        # with a stale pickle — both consistent
        extdir = path.with_suffix(".d")
        tmpdir = path.with_suffix(f".d.tmp{os.getpid()}")
        if sink:
            tmpdir.mkdir(exist_ok=True)
            for name, arr in sink:
                np.save(tmpdir / name, arr)
            if extdir.exists():
                import shutil
                shutil.rmtree(extdir)
            os.replace(tmpdir, extdir)
        tmp = path.with_suffix(f".tmp{os.getpid()}")
        with open(tmp, "wb") as f:
            pickle.dump(enc, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except Exception as e:
        logger.warning("tree prep cache: save failed (%s)", e)
        return False
    prep["_cache_path"] = str(path)
    prep["_cache_keys"] = frozenset(body.keys())
    return True


def load_tree_prep(path, background_warm: bool = True) -> Optional[dict]:
    """Reload a persisted prep (host arrays re-uploaded to the device).
    Returns None when absent/unreadable.

    ``background_warm``: start a daemon thread that rebuilds the lazily
    built engine structures (far classes, diag band tables, combine
    indices) while the caller's code runs — the class host gathers then
    overlap the tile-table upload instead of serializing ahead of the
    first solve (~19 s of the round-4 warm first solve).  Solvers
    synchronize on it via ``_ensure_far_classes``."""
    import time as _time

    from .tree import _stage
    path = Path(path)
    if not path.exists():
        return None
    _t0 = _time.perf_counter()
    try:
        with open(path, "rb") as f:
            body = pickle.load(f)
        _stage("load.pickle", _t0); _t0 = _time.perf_counter()
        prep = _decode(body, path.with_suffix(".d"))
        _stage("load.decode", _t0); _t0 = _time.perf_counter()
    except Exception as e:
        logger.warning("tree prep cache: dropping unreadable %s (%s)",
                       path.name, e)
        try:
            path.unlink()
            import shutil
            shutil.rmtree(path.with_suffix(".d"), ignore_errors=True)
        except OSError:
            pass
        return None
    import jax.numpy as jnp

    from ..util.thp import thp_stage
    prep["_tree"] = None
    warm_ex = None
    if background_warm:
        # start the engine-structure warm NOW: its class host gathers and
        # uploads overlap the tile-table upload below (the warm thread
        # blocks on prep["_tiles_ready"] only where it needs the table)
        import threading
        from concurrent.futures import ThreadPoolExecutor

        from .tree_tpu import warm_prep_structures
        prep["_tiles_ready"] = threading.Event()
        warm_ex = ThreadPoolExecutor(max_workers=1)
        prep["_warm_future"] = warm_ex.submit(warm_prep_structures, prep)
        warm_ex.shutdown(wait=False)
    try:
        # rebuild the device tile table; windows rebuild lazily
        # (window/packed builders detect absence).  Compact-matrix preps
        # upload the staged (n+1, 6) matrix and gather the table on
        # device; legacy caches re-upload the full table (sidecar mmaps
        # always staged — mmap-direct uploads measured ~9 MB/s through
        # the relay)
        nl = prep["n_blocks"]
        if prep.get("_part_mat") is not None:
            from .tree_tpu import _leaf_tiles_on_device
            pm = thp_stage(prep["_part_mat"])
            prep["_part_mat"] = pm
            _stage("load.tiles_stage", _t0); _t0 = _time.perf_counter()
            pad32 = (-(nl + 1)) % 32
            tiles = _leaf_tiles_on_device(pm, prep["lstarts"],
                                          prep["lcounts"],
                                          nl, pad32, prep["cap"])
            _stage("load.tiles_upload", _t0)
        else:
            staged = thp_stage(prep["_tiles_np"])
            _stage("load.tiles_stage", _t0); _t0 = _time.perf_counter()
            tiles = jnp.asarray(staged)
            _stage("load.tiles_upload", _t0)
        prep["tiles"] = tiles
        prep["tgt_tiles"] = tiles[:nl]
    finally:
        ev = prep.get("_tiles_ready")
        if ev is not None:
            ev.set()  # even on failure: never strand the warm thread
    prep["_cache_path"] = str(path)
    prep["_cache_keys"] = frozenset(body.keys())
    return prep


def refresh_tree_prep_cache(prep: dict) -> bool:
    """Re-save a cached prep iff lazily-built engine structures appeared
    since the last save (call after the first solve)."""
    path = prep.get("_cache_path")
    if not path:
        return False
    current = frozenset(_persistable(prep).keys())
    if current == prep.get("_cache_keys"):
        return False
    return save_tree_prep(prep, path)


def cached_prepare_tree_pallas(pos, mass=None, softenings=None, *,
                               leaf_capacity: int = 128,
                               multipole_order: int = 0,
                               kernel: Optional[str] = None,
                               theta: float = 0.7, group_leaves: int = 8,
                               cap: int = 128,
                               cache_dir="~/.cache/pnx-tree"
                               ) -> Tuple[dict, Any]:
    """Prep for the device-tree engines, through the disk cache.

    Cache hit: NO octree is built — the returned tree handle is ``None``
    and the prep is fully self-contained (pass it as ``prep=`` to the
    device drivers, whose ``tree`` argument is then unused).
    Cache miss: builds tree + prep, saves, returns ``(prep, tree)``.
    """
    from .tree import Octree
    from .tree_tpu import prepare_tree_pallas

    root = Path(os.path.expanduser(str(cache_dir)))
    fp = tree_prep_fingerprint(
        pos, mass, softenings, leaf_capacity=leaf_capacity,
        multipole_order=multipole_order, kernel=kernel, theta=theta,
        group_leaves=group_leaves, cap=cap)
    path = root / f"treeprep-{fp}.pkl"
    prep = load_tree_prep(path)
    if prep is not None:
        logger.info("tree prep cache hit: %s", path.name)
        return prep, None
    tree = Octree(pos, mass, leaf_capacity=leaf_capacity,
                  multipole_order=multipole_order, softenings=softenings,
                  kernel=kernel)
    prep = prepare_tree_pallas(tree, theta=theta, cap=cap,
                               group_leaves=group_leaves)
    save_tree_prep(prep, path)
    return prep, tree
