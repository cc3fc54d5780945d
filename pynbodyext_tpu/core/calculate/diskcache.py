"""Persistent cross-run result cache keyed by structural signatures.

The reference has no checkpoint/resume; its structural
``signature_hash()`` is explicitly "designed as a stable cross-session
identity for future persistent caching" (reference ``base.py:513-529``,
SURVEY.md §5).  This module implements that extension:

* cache key = (snapshot content fingerprint, scope token, node signature);
* only *stable* signatures participate — any fragment that fell back to an
  ``id()`` identity (big arrays, callables, opaque objects) disqualifies the
  node, since ids don't survive the process;
* values are stored as pickles with device arrays converted to numpy;
  reloaded values come back as numpy (QArray-compatible).

Enable per-run: ``calc.run(sim, disk_cache="~/.cache/pnx")`` or via
``RunOptions(disk_cache=...)``.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path
from typing import Any, Optional, Tuple

import numpy as np

from ...log import logger

__all__ = ["DiskResultCache", "signature_is_stable", "snapshot_fingerprint"]

_UNSTABLE_TAGS = {"arr*", "fn", "obj", "id", "lambda"}


def signature_is_stable(sig: Any) -> bool:
    """True when a signature tuple contains no process-local identities."""
    if isinstance(sig, tuple):
        if sig and isinstance(sig[0], str) and sig[0] in _UNSTABLE_TAGS:
            return False
        return all(signature_is_stable(s) for s in sig)
    if isinstance(sig, (list,)):
        return all(signature_is_stable(s) for s in sig)
    return isinstance(sig, (str, int, float, complex, bool, bytes,
                            type(None)))


def snapshot_fingerprint(snap) -> str:
    """Cheap content identity for a snapshot: shapes/dtypes/properties plus
    head/tail samples of every field (no full-array hashing)."""
    cached = getattr(snap, "_content_fingerprint", None)
    if cached is not None:
        return cached
    h = hashlib.sha1()
    h.update(repr(sorted((k, str(v)) for k, v in snap.properties.items()
                         if not hasattr(v, "value"))).encode())
    for k, v in sorted(snap.properties.items()):
        if hasattr(v, "value"):
            h.update(f"{k}={float(np.asarray(v.value)):.10g}".encode())
    h.update(repr({k: (sl.start, sl.stop)
                   for k, sl in snap.family_slices.items()}).encode())
    for name in snap.loaded_fields:
        q = snap[name]
        arr = q.value
        h.update(f"{name}:{arr.shape}:{arr.dtype}:{q.units}".encode())
        flat = arr.reshape(-1)
        n = int(flat.shape[0])
        h.update(np.asarray(flat[:16]).tobytes())
        h.update(np.asarray(flat[-16:]).tobytes())
        # interior coverage: strided sample + whole-array reductions so an
        # edit anywhere in the array changes the fingerprint (reductions run
        # device-side for jnp inputs; only scalars cross to host)
        if n > 32:
            stride = max(1, n // 64)
            h.update(np.asarray(flat[::stride][:64]).tobytes())
        h.update(np.asarray(
            [float(flat.sum()), float(flat.min()), float(flat.max())],
            dtype=np.float64).tobytes())
    fp = h.hexdigest()[:20]
    try:
        object.__setattr__(snap, "_content_fingerprint", fp)
    except Exception:
        pass
    return fp


def _to_host(value: Any) -> Any:
    """jnp arrays → numpy (recursively) so pickles are device-free."""
    from ...quantity import QArray
    if isinstance(value, QArray):
        return QArray(np.asarray(value.value), value.units)
    if hasattr(value, "shape") and hasattr(value, "dtype") \
            and not isinstance(value, np.ndarray):
        return np.asarray(value)
    if isinstance(value, tuple):
        return tuple(_to_host(v) for v in value)
    if isinstance(value, list):
        return [_to_host(v) for v in value]
    if isinstance(value, dict):
        return {k: _to_host(v) for k, v in value.items()}
    return value


class DiskResultCache:
    def __init__(self, path: str):
        self.root = Path(os.path.expanduser(path))
        self.root.mkdir(parents=True, exist_ok=True)
        self.hits = 0
        self.misses = 0
        self.stores = 0

    def _path_for(self, sim_fp: str, token: Tuple, node_sig: Tuple) -> Path:
        key = hashlib.sha1(
            repr((sim_fp, token, node_sig)).encode()).hexdigest()
        return self.root / f"{key}.pkl"

    def lookup_key(self, sim, token: Tuple, node) -> Optional[Path]:
        sig = node.signature()
        if not (signature_is_stable(sig) and signature_is_stable(token)):
            return None
        return self._path_for(snapshot_fingerprint(sim), token, sig)

    def get(self, path: Path) -> Optional[Tuple[Any, Any]]:
        if not path.exists():
            self.misses += 1
            return None
        try:
            with open(path, "rb") as f:
                raw, public = pickle.load(f)
            self.hits += 1
            return raw, public
        except Exception as e:  # corrupted entry → treat as miss
            logger.warning("disk cache: dropping unreadable entry %s (%s)",
                           path.name, e)
            try:
                path.unlink()
            except OSError:
                pass
            self.misses += 1
            return None

    def put(self, path: Path, raw: Any, public: Any,
            max_bytes: int = 64 << 20) -> bool:
        try:
            blob = pickle.dumps((_to_host(raw), _to_host(public)),
                                protocol=pickle.HIGHEST_PROTOCOL)
        except Exception:
            return False  # unpicklable (views, handles…) → skip silently
        if len(blob) > max_bytes:
            return False
        tmp = path.with_suffix(".tmp")
        try:
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
        except OSError:
            return False
        self.stores += 1
        return True

    def summary(self) -> dict:
        return {"hits": self.hits, "misses": self.misses,
                "stores": self.stores, "dir": str(self.root)}
