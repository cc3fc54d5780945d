"""Immutable structure-of-arrays snapshot — the TPU-native ``SimSnap``.

Reference counterpart: pynbody ``SimSnap`` (mutable, lazy-loading, family
sub-views) as consumed by ``/root/reference/pynbodyext`` everywhere.
TPU-first design divergences (SURVEY.md §7 "Design translation"):

* **Immutable pytree of device arrays.**  A :class:`Snapshot` owns a dict of
  flattened per-particle fields, each a ``QArray`` over ALL particles, sorted
  by family, plus *static* family slices.  Transforms never mutate — they
  produce a new :class:`Snapshot` via :meth:`Snapshot.with_fields` that shares
  every untouched array (copy-on-write at field granularity).
* **Sub-views are masks, never gathers.**  ``snap[filter]`` /
  ``snap.families("star")`` return a :class:`ParticleView` carrying the same
  full-length arrays plus a boolean mask; reductions fuse the mask on-device
  (reference gathers a copy at ``context.py:641`` — that materialization is
  exactly what we avoid on TPU).
* **Units are host-side** (:mod:`..units`); raw ``jax`` arrays flow through
  jitted code.
"""

from __future__ import annotations

import itertools
from typing import Callable, Dict, Mapping, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..quantity import QArray, strip_units
from ..units import Unit, UnitLike, dimensionless

__all__ = ["Snapshot", "ParticleView", "SnapLike", "derived_field",
           "DEFAULT_FAMILIES", "FAMILY_ALIASES"]

#: canonical family ordering (matches gadget PartType conventions loosely)
DEFAULT_FAMILIES = ("gas", "dm", "star", "bh")

FAMILY_ALIASES = {
    "g": "gas", "gas": "gas",
    "d": "dm", "dm": "dm", "dark": "dm",
    "s": "star", "star": "star", "stars": "star",
    "bh": "bh",
}

_DERIVED_REGISTRY: Dict[str, Callable] = {}


def derived_field(name: str):
    """Register a derived-field function ``fn(view) -> QArray``.

    Mirrors pynbody's derived-array machinery (used by the reference at e.g.
    ``chunk/chunksnap.py:123``) but as a plain host-side registry; results are
    cached per-snapshot.
    """

    def deco(fn: Callable):
        _DERIVED_REGISTRY[name] = fn
        return fn

    return deco


_snap_counter = itertools.count()


class _ViewBase:
    """Shared protocol between :class:`Snapshot` and :class:`ParticleView`."""

    # subclasses define: .base (Snapshot), .mask (Optional[jax.Array])

    # -- field access -----------------------------------------------------
    def __getitem__(self, key):
        if isinstance(key, str):
            return self._get_field(key)
        # calculator filters expose `where(view) -> bool mask` (duck-typed to
        # avoid an import cycle with the core engine)
        if hasattr(key, "where") and callable(key.where):
            mask = key.where(self)
            return self._submask(strip_units(mask))
        if isinstance(key, (np.ndarray, jax.Array)):
            arr = jnp.asarray(key)
            if arr.dtype == bool or arr.dtype == jnp.bool_:
                return self._submask(arr)
            raise TypeError("index arrays must be boolean masks (TPU-native "
                            "views never gather); got dtype "
                            f"{arr.dtype}")
        raise TypeError(f"cannot index snapshot with {type(key).__name__}")

    def _get_field(self, key: str) -> QArray:
        base = self.base
        if key in base._fields:
            return base._fields[key]
        # component views: "x","y","z" / "vx","vy","vz"
        comp = _COMPONENTS.get(key)
        if comp is not None:
            src, idx = comp
            if src in base._fields or src in _DERIVED_REGISTRY:
                v = self._get_field(src)
                return QArray(v.value[..., idx], v.units)
        if key in base._derived_cache:
            return base._derived_cache[key]
        fn = _DERIVED_REGISTRY.get(key)
        if fn is not None:
            val = fn(base)
            if not isinstance(val, QArray):
                val = QArray(val, dimensionless)
            base._derived_cache[key] = val
            return val
        raise KeyError(f"unknown field {key!r} (loaded: "
                       f"{sorted(base._fields)}; derivable: "
                       f"{sorted(_DERIVED_REGISTRY)})")

    def has_field(self, key: str) -> bool:
        try:
            self._get_field(key)
            return True
        except KeyError:
            return False

    def field_value(self, key: str, units: UnitLike = None, **ctx):
        """Raw jnp array for ``key`` (optionally converted) — the jit boundary."""
        q = self._get_field(key)
        return q.to_value(units, **ctx) if units is not None else q.value

    # -- family handling -----------------------------------------------------
    def family_mask(self, *names: str) -> jax.Array:
        base = self.base
        m = jnp.zeros(base.n_total, dtype=bool)
        for name in names:
            fam = FAMILY_ALIASES.get(name, name)
            sl = base.family_slices.get(fam)
            if sl is not None:
                n = sl.stop - sl.start
                if n > 0:
                    m = jax.lax.dynamic_update_slice(
                        m, jnp.ones(n, dtype=bool), (sl.start,))
        return m

    def families(self, *names: str) -> "ParticleView":
        return self._submask(self.family_mask(*names))

    @property
    def s(self) -> "ParticleView":
        return self.families("star")

    @property
    def g(self) -> "ParticleView":
        return self.families("gas")

    @property
    def dm(self) -> "ParticleView":
        return self.families("dm")

    # -- mask composition ------------------------------------------------------
    def _submask(self, mask: jax.Array) -> "ParticleView":
        own = self.mask
        if own is not None:
            mask = jnp.logical_and(own, mask)
        return ParticleView(self.base, mask)

    @property
    def effective_mask(self) -> jax.Array:
        """Always-materialized boolean mask (all-True for a full snapshot)."""
        if self.mask is None:
            return jnp.ones(self.base.n_total, dtype=bool)
        return self.mask

    def __len__(self) -> int:
        if self.mask is None:
            return self.base.n_total
        return int(jnp.sum(self.mask))

    # -- properties passthrough ---------------------------------------------
    @property
    def ancestor(self) -> "Snapshot":
        return self.base

    def units_context(self) -> dict:
        """Cosmological context (a, h) for unit conversion, if known."""
        p = self.base.properties
        ctx = {}
        if "a" in p:
            ctx["a"] = float(strip_units(p["a"]))
        if "h" in p:
            ctx["h"] = float(strip_units(p["h"]))
        return ctx


class Snapshot(_ViewBase):
    """Flattened, family-sorted, immutable particle snapshot.

    Parameters
    ----------
    fields:
        mapping field name → array or ``QArray``; every array's leading axis
        is the total particle count, particles sorted by family in
        ``family_slices`` order.
    family_slices:
        mapping family name → ``slice`` into the flattened axis (static
        Python ints — they parameterize jit specializations, never traced).
    properties:
        snapshot metadata: ``boxsize`` (QArray), ``time``, ``a``, ``h``, …
    units:
        optional mapping field name → unit for raw-array fields.
    """

    def __init__(self,
                 fields: Mapping[str, Union[QArray, np.ndarray, jax.Array]],
                 family_slices: Mapping[str, slice],
                 properties: Optional[dict] = None,
                 units: Optional[Mapping[str, UnitLike]] = None,
                 _derived_cache: Optional[dict] = None):
        units = units or {}
        self._fields: Dict[str, QArray] = {}
        n = None
        for k, v in fields.items():
            if not isinstance(v, QArray):
                v = QArray(jnp.asarray(v), units.get(k))
            self._fields[k] = v
            if n is None:
                n = v.shape[0]
            elif v.shape[0] != n:
                raise ValueError(f"field {k!r} length {v.shape[0]} != {n}")
        self.n_total = int(n or 0)
        self.family_slices = {FAMILY_ALIASES.get(k, k): v
                              for k, v in family_slices.items()}
        covered = sum(sl.stop - sl.start for sl in self.family_slices.values())
        if self.family_slices and covered != self.n_total:
            raise ValueError(
                f"family slices cover {covered} particles, have {self.n_total}")
        self.properties = dict(properties or {})
        self._derived_cache: Dict[str, QArray] = (
            dict(_derived_cache) if _derived_cache else {})
        self._uid = next(_snap_counter)

    # snapshot is its own base with no mask
    @property
    def base(self) -> "Snapshot":
        return self

    mask = None

    def __len__(self) -> int:
        return self.n_total

    @property
    def loaded_fields(self) -> tuple:
        return tuple(sorted(self._fields))

    def signature(self) -> tuple:
        """Identity token used by the run cache (reference ``engine.py:647``)."""
        return ("snap", self._uid)

    # -- functional update -------------------------------------------------------
    def with_fields(self, _invalidate_derived: bool = True, **overrides) -> "Snapshot":
        """New snapshot sharing all arrays except ``overrides`` (pure update).

        This replaces the reference's in-place transforms + revert handles
        (``transforms.py:290,371``): revert is simply "keep using the old
        object".
        """
        fields = dict(self._fields)
        for k, v in overrides.items():
            if hasattr(v, "compute") and hasattr(v, "chunk"):
                v = v.compute()  # StreamingArray → QArray
            if not isinstance(v, QArray):
                old = fields.get(k)
                v = QArray(jnp.asarray(v), old.units if old is not None else None)
            fields[k] = v
        return Snapshot(fields, self.family_slices, self.properties,
                        _derived_cache=None if _invalidate_derived
                        else self._derived_cache)

    def with_properties(self, **props) -> "Snapshot":
        p = dict(self.properties)
        p.update(props)
        # properties can feed derived fields (e.g. 'age' reads 'time'),
        # so the derived cache must not carry over
        return Snapshot(self._fields, self.family_slices, p)

    def __repr__(self):
        fams = {k: sl.stop - sl.start for k, sl in self.family_slices.items()}
        return (f"<Snapshot N={self.n_total} families={fams} "
                f"fields={list(self._fields)}>")


class ParticleView(_ViewBase):
    """A masked view of a snapshot — no data copied, mask fused downstream."""

    def __init__(self, base: Snapshot, mask: Optional[jax.Array]):
        self.base = base
        self.mask = mask

    @property
    def properties(self) -> dict:
        return self.base.properties

    def __repr__(self):
        return f"<ParticleView of N={self.base.n_total}>"


SnapLike = Union[Snapshot, ParticleView]


# component shortcuts resolved in _get_field
_COMPONENTS = {
    "x": ("pos", 0), "y": ("pos", 1), "z": ("pos", 2),
    "vx": ("vel", 0), "vy": ("vel", 1), "vz": ("vel", 2),
}
