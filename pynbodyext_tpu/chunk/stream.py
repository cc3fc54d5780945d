"""Chunk stores, streaming arrays, and the chunked snapshot facade."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..quantity import QArray, strip_units
from ..snap.snapshot import FAMILY_ALIASES, Snapshot
from ..units import Unit, UnitLike, dimensionless, parse_unit

__all__ = ["ChunkStore", "SnapshotChunkStore", "HDF5ChunkStore",
           "StreamingArray", "ChunkedSnapshot", "ChunkView", "ChunkedMask",
           "is_streaming_array"]


@dataclasses.dataclass(frozen=True)
class FieldInfo:
    """Shape/dtype/units metadata probed without loading data
    (the ``ArrayInfo`` of reference ``chunk/snapview.py:108``)."""
    name: str
    shape_tail: tuple
    dtype: Any
    units: Unit


class ChunkStore:
    """Chunk source protocol: metadata + per-chunk array loading.

    Chunks are contiguous slices of the flattened family-sorted particle
    axis (so family slices and masks stay positional, like everything else
    in this framework).
    """

    # subclasses set: n_total, family_slices, properties, _fields (dict of
    # FieldInfo), chunk_size

    @property
    def n_chunks(self) -> int:
        return -(-self.n_total // self.chunk_size)

    def chunk_bounds(self, i: int) -> Tuple[int, int]:
        lo = i * self.chunk_size
        return lo, min(lo + self.chunk_size, self.n_total)

    def field_info(self, name: str) -> FieldInfo:
        try:
            return self._fields[name]
        except KeyError:
            raise KeyError(f"unknown field {name!r}; have "
                           f"{sorted(self._fields)}") from None

    @property
    def field_names(self) -> List[str]:
        return sorted(self._fields)

    def load_chunk(self, name: str, i: int) -> np.ndarray:
        raise NotImplementedError


class SnapshotChunkStore(ChunkStore):
    """Chunk view over an in-memory Snapshot (testing / uniform API)."""

    def __init__(self, snap: Snapshot, chunk_size: int = 1_000_000):
        self._snap = snap
        self.n_total = snap.n_total
        self.chunk_size = int(chunk_size)
        self.family_slices = dict(snap.family_slices)
        self.properties = dict(snap.properties)
        self._fields = {
            name: FieldInfo(name, tuple(snap[name].shape[1:]),
                            snap[name].dtype, snap[name].units)
            for name in snap.loaded_fields}

    def field_info(self, name: str) -> FieldInfo:
        info = self._fields.get(name)
        if info is None and self._snap.has_field(name):
            # derived fields resolve lazily (reference runs derivations on
            # dask arrays too, ``chunksnap.py:123``)
            q = self._snap[name]
            info = FieldInfo(name, tuple(q.shape[1:]), q.dtype, q.units)
            self._fields[name] = info
        if info is None:
            return super().field_info(name)
        return info

    def load_chunk(self, name: str, i: int) -> np.ndarray:
        lo, hi = self.chunk_bounds(i)
        return np.asarray(self._snap[name].value[lo:hi])


class HDF5ChunkStore(ChunkStore):
    """Gadget-HDF5 backed store reading dataset slices on demand
    (true out-of-core: only ``chunk_size`` rows are resident per load)."""

    def __init__(self, path: str, chunk_size: int = 1_000_000,
                 dtype=np.float32):
        import h5py
        from ..snap.loaders import _DEF_UNITS, _FIELD_MAP, _PARTTYPE_FAMILY
        self.path = path
        self.chunk_size = int(chunk_size)
        self._dtype = dtype
        self._fields: Dict[str, FieldInfo] = {}
        # (field → [(family, part_key, h5name, n)]) in family order
        self._layout: Dict[str, List[Tuple[str, str, str, int]]] = {}
        self.properties: dict = {}
        self.family_slices: Dict[str, slice] = {}
        with h5py.File(path, "r") as f:
            hdr = dict(f["Header"].attrs)
            self.properties["time"] = float(hdr.get("Time", 0.0))
            self.properties["a"] = float(hdr.get("Time", 1.0))
            self.properties["h"] = float(hdr.get("HubbleParam", 1.0))
            box = float(hdr.get("BoxSize", 0.0))
            if box > 0:
                self.properties["boxsize"] = QArray(box, _DEF_UNITS["pos"])
            start = 0
            for pt, fam in _PARTTYPE_FAMILY.items():
                key = f"PartType{pt}"
                if key not in f:
                    continue
                grp = f[key]
                n = None
                for h5name, ds in grp.items():
                    name = _FIELD_MAP.get(h5name, h5name.lower())
                    n = ds.shape[0]
                    info = self._fields.get(name)
                    if info is None:
                        self._fields[name] = FieldInfo(
                            name, tuple(ds.shape[1:]),
                            dtype if ds.dtype.kind == "f" else ds.dtype,
                            parse_unit(_DEF_UNITS.get(name)))
                    self._layout.setdefault(name, []).append(
                        (fam, key, h5name, n))
                if n:
                    self.family_slices[fam] = slice(start, start + n)
                    start += n
        self.n_total = start

    def load_chunk(self, name: str, i: int) -> np.ndarray:
        import h5py
        lo, hi = self.chunk_bounds(i)
        info = self.field_info(name)
        out = np.zeros((hi - lo,) + info.shape_tail, dtype=info.dtype)
        with h5py.File(self.path, "r") as f:
            for fam, key, h5name, n in self._layout.get(name, []):
                sl = self.family_slices[fam]
                a = max(lo, sl.start)
                b = min(hi, sl.stop)
                if a >= b:
                    continue
                ds = f[key][h5name]
                out[a - lo:b - lo] = ds[a - sl.start:b - sl.start]
        return out


# ---------------------------------------------------------------------------
# Streaming arrays
# ---------------------------------------------------------------------------

def is_streaming_array(x) -> bool:
    """Reference parity: ``chunk.is_dask_array`` (``proarray.py:316``)."""
    return isinstance(x, StreamingArray)


class StreamingArray:
    """Lazy unit-tracking array over chunks (``SimDaskArray`` analogue).

    Elementwise operations compose per-chunk device closures; reductions
    stream chunks host→device with bounded residency (one chunk at a time —
    the reference's residency semaphore collapses to sequential streaming,
    ``chunk/chunk.py:63``).  ``compute()`` concatenates into a real QArray.

    ``mask_fn`` (optional, ``i → bool (chunk_rows,)``) restricts the array
    to a subset — family views and filters.  Reductions are mask-aware
    (min/max/mean see only selected rows, matching the reference's exact
    chunked family views) and ``compute()`` drops unselected rows.
    """

    def __init__(self, store: ChunkStore,
                 chunk_fn: Callable[[int], jnp.ndarray],
                 units: Unit, shape_tail: tuple = (), name: str = "",
                 mask_fn: Optional[Callable[[int], jnp.ndarray]] = None,
                 length: Optional[int] = None):
        self._store = store
        self._chunk_fn = chunk_fn
        self.units = units
        self._shape_tail = shape_tail
        self.name = name
        self._mask_fn = mask_fn
        self._length = length

    # -- construction ------------------------------------------------------
    @classmethod
    def from_field(cls, store: ChunkStore, name: str) -> "StreamingArray":
        info = store.field_info(name)

        def load(i: int):
            return jnp.asarray(store.load_chunk(name, i))

        return cls(store, load, info.units, info.shape_tail, name)

    # -- shape protocol ---------------------------------------------------------
    @property
    def shape(self) -> tuple:
        n = self._store.n_total if self._length is None else self._length
        return (n,) + self._shape_tail

    @property
    def ndim(self) -> int:
        return 1 + len(self._shape_tail)

    def __len__(self) -> int:
        return self.shape[0]

    def chunk(self, i: int) -> jnp.ndarray:
        return self._chunk_fn(i)

    def chunk_mask(self, i: int) -> Optional[jnp.ndarray]:
        return None if self._mask_fn is None else self._mask_fn(i)

    # -- lazy elementwise composition ----------------------------------------
    def map(self, fn: Callable, units: Optional[UnitLike] = None,
            shape_tail: Optional[tuple] = None) -> "StreamingArray":
        prev = self._chunk_fn
        return StreamingArray(
            self._store, lambda i: fn(prev(i)),
            parse_unit(units) if units is not None else self.units,
            self._shape_tail if shape_tail is None else shape_tail,
            name=f"map({self.name})", mask_fn=self._mask_fn,
            length=self._length)

    def rename(self, name: str) -> "StreamingArray":
        self.name = name
        return self

    def with_mask(self, mask_fn: Callable[[int], jnp.ndarray],
                  length: Optional[int] = None) -> "StreamingArray":
        """Restrict to rows where ``mask_fn(i)`` is True (AND-merged with
        any existing mask).  ``length`` is the selected count if known."""
        prev = self._mask_fn
        if prev is None:
            combined = mask_fn
        else:
            def combined(i):
                return jnp.logical_and(prev(i), mask_fn(i))
        return StreamingArray(self._store, self._chunk_fn, self.units,
                              self._shape_tail, name=self.name,
                              mask_fn=combined, length=length)

    def _binop(self, other, op, unit_op) -> "StreamingArray":
        if isinstance(other, StreamingArray):
            if other._store is not self._store:
                raise ValueError("streaming arrays must share a ChunkStore")
            a, b = self._chunk_fn, other._chunk_fn
            units = unit_op(self.units, other.units)
            ma, mb = self._mask_fn, other._mask_fn
            if ma is None:
                mask = mb
            elif mb is None:
                mask = ma
            else:
                def mask(i):
                    return jnp.logical_and(ma(i), mb(i))
            return StreamingArray(self._store, lambda i: op(a(i), b(i)),
                                  units, self._shape_tail, mask_fn=mask,
                                  length=(self._length if mb is None
                                          else other._length))
        ou = other.units if isinstance(other, QArray) else dimensionless
        ov = strip_units(other)
        a = self._chunk_fn
        return StreamingArray(self._store, lambda i: op(a(i), ov),
                              unit_op(self.units, ou), self._shape_tail,
                              mask_fn=self._mask_fn, length=self._length)

    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b, lambda u, v: u)

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b, lambda u, v: u)

    def __mul__(self, o):
        return self._binop(o, lambda a, b: a * b, lambda u, v: u * v)

    __rmul__ = __mul__

    def __truediv__(self, o):
        return self._binop(o, lambda a, b: a / b, lambda u, v: u / v)

    def __pow__(self, p):
        return self.map(lambda x: x ** p, units=self.units ** p)

    def __neg__(self):
        return self.map(lambda x: -x)

    def __abs__(self):
        return self.map(jnp.abs)

    # -- streaming reductions (mask-aware: exact over family/filter views) ----
    def _bcast_mask(self, m, c):
        return m.reshape(m.shape + (1,) * (c.ndim - 1))

    def _reduce(self, fn_chunk, combine, init):
        acc = init
        for i in range(self._store.n_chunks):
            acc = combine(acc, fn_chunk(self.chunk(i), self.chunk_mask(i)))
        return acc

    def sum(self, axis=None) -> QArray:
        if axis not in (None, 0):
            raise ValueError("streaming reductions are over the particle axis")

        def part(c, m):
            if m is not None:
                c = jnp.where(self._bcast_mask(m, c), c, jnp.zeros((), c.dtype))
            return jnp.sum(c, axis=0)

        return QArray(self._reduce(part, lambda a, b: a + b, 0.0), self.units)

    def min(self) -> QArray:
        def part(c, m):
            if m is not None:
                c = jnp.where(self._bcast_mask(m, c), c, jnp.inf)
            return jnp.min(c)

        return QArray(self._reduce(part, jnp.minimum, jnp.inf), self.units)

    def max(self) -> QArray:
        def part(c, m):
            if m is not None:
                c = jnp.where(self._bcast_mask(m, c), c, -jnp.inf)
            return jnp.max(c)

        return QArray(self._reduce(part, jnp.maximum, -jnp.inf), self.units)

    def count(self):
        """Number of selected rows (streams masks only)."""
        if self._mask_fn is None:
            return self._store.n_total
        tot = 0
        for i in range(self._store.n_chunks):
            tot += int(jnp.sum(self._mask_fn(i)))
        return tot

    def mean(self) -> QArray:
        if self._mask_fn is None:
            n = self._store.n_total
            return QArray(self.sum().value / n, self.units)

        def part(c, m):
            mm = self._bcast_mask(m, c)
            s = jnp.sum(jnp.where(mm, c, jnp.zeros((), c.dtype)), axis=0)
            return s, jnp.sum(m)

        def combine(a, b):
            return a[0] + b[0], a[1] + b[1]

        s, n = self._reduce(part, combine, (0.0, 0))
        return QArray(s / jnp.maximum(n, 1), self.units)

    # -- materialization ---------------------------------------------------------
    def compute(self) -> QArray:
        """Concatenate all chunks into one device array, dropping unselected
        rows (``SimDaskArray.compute``, ``simdaskarray.py:342``)."""
        parts = []
        for i in range(self._store.n_chunks):
            c = self.chunk(i)
            m = self.chunk_mask(i)
            if m is not None:
                c = c[np.asarray(m)]
            parts.append(c)
        return QArray(jnp.concatenate(parts, axis=0), self.units)

    def in_units(self, target: UnitLike, **ctx) -> "StreamingArray":
        factor = self.units.ratio(target, **ctx)
        return self.map(lambda x: x * factor, units=target)

    def __repr__(self):
        return (f"<StreamingArray {self.name!r} shape={self.shape} "
                f"chunks={self._store.n_chunks} units='{self.units}'>")


def stream_weighted_mean(vec: "StreamingArray",
                         w: "StreamingArray") -> jnp.ndarray:
    """Σ w·v / Σ w over the (shared) selection, one chunk resident at a
    time — the chunked ``center_of_mass``."""
    num, den = 0.0, 0.0
    for i in range(vec._store.n_chunks):
        v = vec.chunk(i)
        ww = w.chunk(i)
        m = vec.chunk_mask(i)
        if m is not None:
            ww = jnp.where(m, ww, 0.0)
        num = num + jnp.sum(v * ww.reshape(ww.shape + (1,) * (v.ndim - 1)),
                            axis=0)
        den = den + jnp.sum(ww)
    return num / jnp.maximum(den, 1e-30)


def stream_weighted_cross_sum(pos: "StreamingArray", vel: "StreamingArray",
                              w: "StreamingArray") -> jnp.ndarray:
    """Σ w·(r×v) over the selection (chunked angular momentum)."""
    out = 0.0
    for i in range(pos._store.n_chunks):
        p = pos.chunk(i)
        v = vel.chunk(i)
        ww = w.chunk(i)
        m = pos.chunk_mask(i)
        if m is not None:
            ww = jnp.where(m, ww, 0.0)
        out = out + jnp.sum(jnp.cross(p, v) * ww[:, None], axis=0)
    return out


# ---------------------------------------------------------------------------
# Chunk-local views + lazy masks (engine integration)
# ---------------------------------------------------------------------------

class ChunkView:
    """Chunk-local snapshot facade: fields load on demand, derived fields
    evaluate through the normal registry, family masks are chunk-local.

    This is what lets every mask-shaped calculator run UNCHANGED on
    chunked snapshots: ``FilterBase.build_mask(chunk_view, params)`` per
    chunk (the reference instead makes ``ChunkSimSnap`` a full SimSnap,
    ``chunk/chunksnap.py:84-121``)."""

    mask = None  # chunk views carry no row mask (selection composes outside)

    def __init__(self, store: ChunkStore, i: int, put=None):
        self._store = store
        self._i = i
        self._lo, self._hi = store.chunk_bounds(i)
        self._cache: Dict[str, QArray] = {}
        self._put = jnp.asarray if put is None else put

    def __len__(self) -> int:
        return self._hi - self._lo

    @property
    def properties(self) -> dict:
        return self._store.properties

    def units_context(self) -> dict:
        out = {}
        for k in ("a", "h"):
            v = self.properties.get(k)
            if v is not None:
                out[k] = float(strip_units(v))
        return out

    def has_field(self, key: str) -> bool:
        if key in self._store._fields or key in self._store.field_names:
            return True
        from ..snap.snapshot import _DERIVED_REGISTRY
        return key in _DERIVED_REGISTRY

    def __getitem__(self, key: str) -> QArray:
        got = self._cache.get(key)
        if got is not None:
            return got
        try:
            info = self._store.field_info(key)
            q = QArray(self._put(self._store.load_chunk(key, self._i)),
                       info.units)
        except KeyError:
            from ..snap.snapshot import _DERIVED_REGISTRY
            fn = _DERIVED_REGISTRY.get(key)
            if fn is None:
                raise KeyError(f"unknown field {key!r} on chunk view") \
                    from None
            q = fn(self)
        self._cache[key] = q
        return q

    def family_mask(self, *names: str) -> jnp.ndarray:
        idx = jnp.arange(self._lo, self._hi)
        out = jnp.zeros(self._hi - self._lo, bool)
        for name in names:
            fam = FAMILY_ALIASES.get(name, name)
            sl = self._store.family_slices.get(fam)
            if sl is None:
                continue
            out = jnp.logical_or(
                out, jnp.logical_and(idx >= sl.start, idx < sl.stop))
        return out


class ChunkedMask:
    """Lazy per-chunk boolean mask — the chunked ``FilterResult`` payload.

    Duck-typed via the ``chunk_mask_fn`` attribute so the core filter
    combinators can compose chunked and full-length masks without the
    core layer importing this module."""

    def __init__(self, store: ChunkStore, fn: Callable[[int], jnp.ndarray]):
        self.store = store
        self.chunk_mask_fn = fn

    def count(self) -> int:
        return int(sum(int(jnp.sum(self.chunk_mask_fn(i)))
                       for i in range(self.store.n_chunks)))

    def __repr__(self):
        return f"<ChunkedMask chunks={self.store.n_chunks}>"


# ---------------------------------------------------------------------------
# Chunked snapshot facade
# ---------------------------------------------------------------------------

class ChunkedSnapshot:
    """Lazy snapshot over a ChunkStore (``ChunkSimSnap`` analogue).

    ``snap["mass"]`` → :class:`StreamingArray`; ``snap.s["mass"].sum()``
    streams with per-chunk family masks; ``materialize()`` gathers (a subset
    of) fields into an in-HBM :class:`~..snap.Snapshot` for full-engine use.
    """

    def __init__(self, source, chunk_size: int = 1_000_000,
                 family: Optional[str] = None, mesh=None):
        if isinstance(source, ChunkStore):
            self.store = source
        elif isinstance(source, Snapshot):
            self.store = SnapshotChunkStore(source, chunk_size)
        elif isinstance(source, str):
            self.store = HDF5ChunkStore(source, chunk_size)
        else:
            raise TypeError(f"cannot build ChunkedSnapshot from "
                            f"{type(source).__name__}")
        self._family = family
        self._extra_mask: Optional[Callable[[int], jnp.ndarray]] = None
        self._mesh = mesh

    # -- execution resources -------------------------------------------------
    def _put(self, x):
        """Host chunk → device: mesh-sharded when one is attached."""
        if self._mesh is None:
            return jnp.asarray(x)
        from .executor import shard_put
        return shard_put(x, self._mesh)

    def sharded(self, mesh) -> "ChunkedSnapshot":
        """View whose chunk uploads split the particle axis over ``mesh``
        (>HBM streaming × multi-device compute; see
        :func:`.executor.shard_put`)."""
        view = ChunkedSnapshot(self.store, family=self._family, mesh=mesh)
        view._extra_mask = self._extra_mask
        return view

    def prefetched(self, workers: int = 2, depth: int = 2,
                   mp_context: str = "spawn") -> "ChunkedSnapshot":
        """View whose chunk loads run ahead in worker processes
        (:class:`.executor.PrefetchStore`; the reference ships pickled
        chunks to dask workers, ``chunk/chunk.py:124-151``).  Call
        ``.store.close()`` (or use as a context manager) when done."""
        from .executor import PrefetchStore
        view = ChunkedSnapshot(
            PrefetchStore(self.store, workers=workers, depth=depth,
                          mp_context=mp_context),
            family=self._family, mesh=self._mesh)
        view._extra_mask = self._extra_mask
        return view

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        close = getattr(self.store, "close", None)
        if close is not None:
            close()

    # -- metadata ------------------------------------------------------------
    def __len__(self) -> int:
        if self._family is None:
            return self.store.n_total
        sl = self.store.family_slices.get(self._family)
        return 0 if sl is None else sl.stop - sl.start

    @property
    def properties(self) -> dict:
        return self.store.properties

    @property
    def family_slices(self) -> Dict[str, slice]:
        return self.store.family_slices

    def keys(self) -> List[str]:
        return self.store.field_names

    @property
    def n_chunks(self) -> int:
        return self.store.n_chunks

    # -- family views ------------------------------------------------------------
    def families(self, name: str) -> "ChunkedSnapshot":
        fam = FAMILY_ALIASES.get(name, name)
        view = ChunkedSnapshot(self.store, family=fam, mesh=self._mesh)
        view._extra_mask = self._extra_mask
        return view

    @property
    def s(self):
        return self.families("star")

    @property
    def g(self):
        return self.families("gas")

    @property
    def dm(self):
        return self.families("dm")

    def _chunk_family_weight(self, i: int) -> Optional[jnp.ndarray]:
        """0/1 per-row weight for the family restriction within chunk i."""
        if self._family is None:
            return None
        sl = self.store.family_slices.get(self._family)
        lo, hi = self.store.chunk_bounds(i)
        if sl is None:
            return self._put(np.zeros(hi - lo, bool))
        idx = np.arange(lo, hi)
        return self._put((idx >= sl.start) & (idx < sl.stop))

    # -- engine integration -----------------------------------------------------
    def chunk_view(self, i: int) -> ChunkView:
        """Chunk-local snapshot facade (filters/derived fields run on it)."""
        return ChunkView(self.store, i, put=self._put)

    def make_chunk_mask(self, fn: Callable[[int], jnp.ndarray]) -> ChunkedMask:
        return ChunkedMask(self.store, fn)

    def chunk_selection(self, i: int) -> Optional[jnp.ndarray]:
        """Combined family+filter row selection for chunk ``i`` (None =
        everything selected)."""
        fam = self._chunk_family_weight(i)
        extra = None if self._extra_mask is None else self._extra_mask(i)
        if fam is None:
            return extra
        if extra is None:
            return fam
        return jnp.logical_and(fam, extra)

    @property
    def base(self) -> "ChunkedSnapshot":
        """Unrestricted snapshot over the same store (Snapshot protocol)."""
        return ChunkedSnapshot(self.store, mesh=self._mesh)

    def where(self, filt) -> ChunkedMask:
        """Chunked mask of a standalone filter (``snap[filt]`` support)."""
        return self.make_chunk_mask(
            lambda i: jnp.asarray(filt.where(self.chunk_view(i))))

    # -- field access ---------------------------------------------------------------
    def __getitem__(self, name) -> StreamingArray:
        if not isinstance(name, str):
            return self._getitem_nonstr(name)
        if name not in self.store._fields:
            try:
                self.store.field_info(name)
            except KeyError:
                # derived field: evaluate the registered closure per chunk
                # (reference lazily derives on dask arrays, chunksnap.py:123)
                from ..snap.snapshot import _DERIVED_REGISTRY
                if name not in _DERIVED_REGISTRY:
                    raise
                probe = _DERIVED_REGISTRY[name](self.chunk_view(0))
                arr = StreamingArray(
                    self.store,
                    lambda i: _DERIVED_REGISTRY[name](self.chunk_view(i)).value,
                    probe.units, tuple(probe.shape[1:]), name)
                return self._restrict(arr, name)
        info = self.store.field_info(name)
        arr = StreamingArray(
            self.store, lambda i: self._put(self.store.load_chunk(name, i)),
            info.units, info.shape_tail, name)
        return self._restrict(arr, name)

    def _getitem_nonstr(self, key):
        """Mask-shaped indexing: chunked masks, filters, full bool arrays →
        filtered views (the engine's ``active[mask]``)."""
        if hasattr(key, "chunk_mask_fn"):
            return self.filtered(key.chunk_mask_fn)
        if hasattr(key, "where"):  # FilterBase duck type
            return self.filtered(
                lambda i, f=key: jnp.asarray(f.where(self.chunk_view(i))))
        if hasattr(key, "shape") and len(getattr(key, "shape", ())) == 1 \
                and key.shape[0] == self.store.n_total:
            arr = key

            def slice_mask(i):
                lo, hi = self.store.chunk_bounds(i)
                return jnp.asarray(arr[lo:hi]).astype(bool)
            return self.filtered(slice_mask)
        raise TypeError(f"cannot index ChunkedSnapshot with "
                        f"{type(key).__name__}")

    def _restrict(self, arr: StreamingArray, name: str) -> StreamingArray:
        if self._family is not None:
            sl = self.store.family_slices.get(self._family)
            fam_n = 0 if sl is None else sl.stop - sl.start
            # mask-aware view: every reduction (incl. min/max/mean) sees
            # ONLY family rows — exact, like the reference's chunked views
            arr = arr.with_mask(self._chunk_family_weight,
                                length=fam_n).rename(
                f"{name}[{self._family}]")
        if self._extra_mask is not None:
            arr = arr.with_mask(self._extra_mask)
        return arr

    def filtered(self, mask_chunk_fn: Callable[[int], jnp.ndarray]
                 ) -> "ChunkedSnapshot":
        """Snapshot view restricted by a per-chunk boolean mask function
        (the chunked analogue of ``snap[filter]``); composes with any
        existing restriction."""
        view = ChunkedSnapshot(self.store, family=self._family,
                               mesh=self._mesh)
        prev = self._extra_mask
        if prev is None:
            view._extra_mask = mask_chunk_fn
        else:
            def view_mask(i):
                return jnp.logical_and(prev(i), mask_chunk_fn(i))
            view._extra_mask = view_mask
        return view

    # -- streaming map-reduce -----------------------------------------------------
    def map_reduce(self, fields: Sequence[str],
                   chunk_fn: Callable[..., Any],
                   combine: Callable[[Any, Any], Any],
                   init: Any, mesh=None):
        """Stream chunks: ``acc = combine(acc, chunk_fn(*field_chunks))``.

        ``chunk_fn`` runs on-device per chunk (jit it for speed); only one
        chunk is resident at a time.  With ``mesh``, each chunk is placed
        particle-sharded across the mesh so ``chunk_fn``'s reductions
        parallelize over chips via GSPMD — the TPU-native analogue of the
        reference shipping chunks to remote dask workers
        (``chunk/chunk.py:124-151``): out-of-core over the host axis,
        data-parallel over the device axis.
        """
        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            import jax
            axis = mesh.axis_names[0]

            def put(a):
                spec = PartitionSpec(axis) if a.ndim == 1 else \
                    PartitionSpec(axis, *([None] * (a.ndim - 1)))
                return jax.device_put(a, NamedSharding(mesh, spec))
            sharding = put
        acc = init
        for i in range(self.store.n_chunks):
            arrays = [jnp.asarray(self.store.load_chunk(f, i))
                      for f in fields]
            if sharding is not None:
                arrays = [sharding(a) for a in arrays]
            acc = combine(acc, chunk_fn(*arrays))
        return acc

    # -- materialization ----------------------------------------------------------
    def materialize(self, fields: Optional[Sequence[str]] = None) -> Snapshot:
        """Load everything into an in-HBM Snapshot (full engine access)."""
        names = list(fields) if fields is not None else self.store.field_names
        data = {}
        for name in names:
            arr = StreamingArray.from_field(self.store, name)
            data[name] = arr.compute()
        return Snapshot(data, self.store.family_slices,
                        self.store.properties)

    def __repr__(self):
        fam = f" family={self._family}" if self._family else ""
        return (f"<ChunkedSnapshot N={self.store.n_total} "
                f"chunks={self.store.n_chunks}{fam}>")
