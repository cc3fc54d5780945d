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
           "StreamingArray", "ChunkedSnapshot", "is_streaming_array"]


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
    """

    def __init__(self, store: ChunkStore,
                 chunk_fn: Callable[[int], jnp.ndarray],
                 units: Unit, shape_tail: tuple = (), name: str = ""):
        self._store = store
        self._chunk_fn = chunk_fn
        self.units = units
        self._shape_tail = shape_tail
        self.name = name

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
        return (self._store.n_total,) + self._shape_tail

    @property
    def ndim(self) -> int:
        return 1 + len(self._shape_tail)

    def __len__(self) -> int:
        return self._store.n_total

    def chunk(self, i: int) -> jnp.ndarray:
        return self._chunk_fn(i)

    # -- lazy elementwise composition ----------------------------------------
    def map(self, fn: Callable, units: Optional[UnitLike] = None,
            shape_tail: Optional[tuple] = None) -> "StreamingArray":
        prev = self._chunk_fn
        return StreamingArray(
            self._store, lambda i: fn(prev(i)),
            parse_unit(units) if units is not None else self.units,
            self._shape_tail if shape_tail is None else shape_tail,
            name=f"map({self.name})")

    def _binop(self, other, op, unit_op) -> "StreamingArray":
        if isinstance(other, StreamingArray):
            if other._store is not self._store:
                raise ValueError("streaming arrays must share a ChunkStore")
            a, b = self._chunk_fn, other._chunk_fn
            units = unit_op(self.units, other.units)
            return StreamingArray(self._store, lambda i: op(a(i), b(i)),
                                  units, self._shape_tail)
        ou = other.units if isinstance(other, QArray) else dimensionless
        ov = strip_units(other)
        a = self._chunk_fn
        return StreamingArray(self._store, lambda i: op(a(i), ov),
                              unit_op(self.units, ou), self._shape_tail)

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
        prev = self._chunk_fn
        return StreamingArray(self._store, lambda i: prev(i) ** p,
                              self.units ** p, self._shape_tail)

    def __neg__(self):
        return self.map(lambda x: -x)

    def __abs__(self):
        return self.map(jnp.abs)

    # -- streaming reductions ------------------------------------------------------
    def _reduce(self, fn_chunk, combine, init):
        acc = init
        for i in range(self._store.n_chunks):
            acc = combine(acc, fn_chunk(self.chunk(i)))
        return acc

    def sum(self, axis=None) -> QArray:
        if axis not in (None, 0):
            raise ValueError("streaming reductions are over the particle axis")
        tot = self._reduce(lambda c: jnp.sum(c, axis=0),
                           lambda a, b: a + b, 0.0)
        return QArray(tot, self.units)

    def min(self) -> QArray:
        v = self._reduce(jnp.min, jnp.minimum, jnp.inf)
        return QArray(v, self.units)

    def max(self) -> QArray:
        v = self._reduce(jnp.max, jnp.maximum, -jnp.inf)
        return QArray(v, self.units)

    def mean(self) -> QArray:
        n = self._store.n_total
        return QArray(self.sum().value / n, self.units)

    # -- materialization ---------------------------------------------------------
    def compute(self) -> QArray:
        """Concatenate all chunks into one device array
        (``SimDaskArray.compute``, ``simdaskarray.py:342``)."""
        parts = [self.chunk(i) for i in range(self._store.n_chunks)]
        return QArray(jnp.concatenate(parts, axis=0), self.units)

    def in_units(self, target: UnitLike, **ctx) -> "StreamingArray":
        factor = self.units.ratio(target, **ctx)
        return self.map(lambda x: x * factor, units=target)

    def __repr__(self):
        return (f"<StreamingArray {self.name!r} shape={self.shape} "
                f"chunks={self._store.n_chunks} units='{self.units}'>")


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
                 family: Optional[str] = None):
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
        return ChunkedSnapshot(self.store, family=fam)

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
            return jnp.zeros(hi - lo, jnp.float32)
        idx = jnp.arange(lo, hi)
        return jnp.logical_and(idx >= sl.start, idx < sl.stop)

    # -- field access ---------------------------------------------------------------
    def __getitem__(self, name: str) -> StreamingArray:
        arr = StreamingArray.from_field(self.store, name)
        if self._family is None:
            return arr
        fam_w = self._chunk_family_weight
        prev = arr._chunk_fn

        def masked(i):
            c = prev(i)
            m = fam_w(i)
            mm = m.reshape(m.shape + (1,) * (c.ndim - 1))
            return jnp.where(mm, c, jnp.zeros((), c.dtype))

        # zeros outside the family: exact for sums; min/max/mean over a
        # family view should use explicit masks — use materialize() there.
        return StreamingArray(self.store, masked, arr.units,
                              arr._shape_tail, name=f"{name}[{self._family}]")

    # -- streaming map-reduce -----------------------------------------------------
    def map_reduce(self, fields: Sequence[str],
                   chunk_fn: Callable[..., Any],
                   combine: Callable[[Any, Any], Any],
                   init: Any):
        """Stream chunks: ``acc = combine(acc, chunk_fn(*field_chunks))``.

        ``chunk_fn`` runs on-device per chunk (jit it for speed); only one
        chunk is resident at a time.
        """
        acc = init
        for i in range(self.store.n_chunks):
            arrays = [jnp.asarray(self.store.load_chunk(f, i))
                      for f in fields]
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
