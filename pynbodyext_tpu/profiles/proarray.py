"""Per-bin profile arrays and the statistic plug-in registry.

Reference counterpart: ``pynbodyext/profiles/proarray.py``.  A
:class:`ProfileArray` binds a per-particle field to a profile's bins; string
indexing computes a statistic per bin.  The reference runs a **Python loop
over bins**, gathering each bin's particles (``proarray.py:272-334``); here
every statistic is a single segment reduction (or one sorted pass for
percentiles) over the full array — no gathers, no host loop.

Statistic registry semantics match the reference exactly
(``proarray.py:550-860``):

* ``mean`` — weighted mean; ``sum`` — unweighted; ``sum_w`` — Σ v·w;
* ``pXX`` percentiles with the shifted weighted-CDF normalization
  ``(cum − cum[0])/(cum[-1] − cum[0])``; ``med``/``median`` = p50;
* ``rms``; ``disp`` = √(E[v²]−E[v]²) clamped; ``abs``/``abs_<stat>``
  composition; empty bins → NaN (except ``sum``/``sum_w`` → 0).
"""

from __future__ import annotations

import re
from typing import List, Optional, Type

import jax.numpy as jnp
import numpy as np

from .. import ops
from ..quantity import QArray
from ..units import Unit, dimensionless

__all__ = ["ProfileArray", "StatisticBase", "get_statistic"]

_STAT_CLASSES: List[Type["StatisticBase"]] = []


class StatisticBase:
    """A per-bin statistic.  Subclasses auto-register
    (reference ``proarray.py:550-578``) and implement
    :meth:`compute` vectorized over all bins."""

    example_name: str = ""

    def __init__(self, key: str):
        self.key = key

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        _STAT_CLASSES.append(cls)

    # -- registry protocol ---------------------------------------------------
    @classmethod
    def valid(cls, key: str) -> Optional["StatisticBase"]:
        return None

    # -- computation ------------------------------------------------------------
    def compute(self, values, seg_ids, nbins: int, weights, mask):
        raise NotImplementedError

    def _nan_empty(self, out, seg_ids, nbins, mask):
        counts = ops.segment_counts(seg_ids, nbins, mask=mask)
        return jnp.where(counts > 0, out, jnp.nan)


def get_statistic(key: str) -> Optional[StatisticBase]:
    """Resolve a statistic key through the registry
    (reference ``ProfileArray.get_statistic``)."""
    for cls in _STAT_CLASSES:
        inst = cls.valid(key)
        if inst is not None:
            return inst
    return None


class Mean(StatisticBase):
    example_name = "mean"

    @classmethod
    def valid(cls, key):
        return cls("mean") if key.lower() == "mean" else None

    def compute(self, values, seg_ids, nbins, weights, mask):
        out = ops.segment_stat(values, seg_ids, nbins, "mean",
                               weights=weights, mask=mask)
        return self._nan_empty(out, seg_ids, nbins, mask)


class Sum(StatisticBase):
    example_name = "sum"

    @classmethod
    def valid(cls, key):
        return cls("sum") if key.lower() == "sum" else None

    def compute(self, values, seg_ids, nbins, weights, mask):
        return ops.segment_stat(values, seg_ids, nbins, "sum", mask=mask)


class Sum_w(StatisticBase):
    example_name = "sum_w"

    @classmethod
    def valid(cls, key):
        return cls("sum_w") if key.lower() == "sum_w" else None

    def compute(self, values, seg_ids, nbins, weights, mask):
        if weights is None:
            return ops.segment_stat(values, seg_ids, nbins, "sum", mask=mask)
        return ops.segment_stat(values, seg_ids, nbins, "sum_w",
                                weights=weights, mask=mask)


class Percentile(StatisticBase):
    example_name = "p16"
    _RE = re.compile(r"^p(\d{1,3})$")

    def __init__(self, key: str, percentile: int):
        super().__init__(key)
        self.percentile = percentile

    @classmethod
    def valid(cls, key):
        m = cls._RE.match(key.lower())
        if m and 0 <= int(m.group(1)) <= 100:
            return cls(key.lower(), int(m.group(1)))
        return None

    def compute(self, values, seg_ids, nbins, weights, mask):
        return ops.segment_weighted_quantile(
            values, seg_ids, nbins, self.percentile / 100.0,
            weights=weights, mask=mask, shift_first=True)


class RMS(StatisticBase):
    example_name = "rms"

    @classmethod
    def valid(cls, key):
        return cls("rms") if key.lower() == "rms" else None

    def compute(self, values, seg_ids, nbins, weights, mask):
        out = ops.segment_stat(values, seg_ids, nbins, "rms",
                               weights=weights, mask=mask)
        return self._nan_empty(out, seg_ids, nbins, mask)


class Median(StatisticBase):
    example_name = "median"

    @classmethod
    def valid(cls, key):
        return cls("median") if key.lower() in ("med", "median") else None

    def compute(self, values, seg_ids, nbins, weights, mask):
        return Percentile("p50", 50).compute(values, seg_ids, nbins,
                                             weights, mask)


class Abs(StatisticBase):
    """``abs`` / ``abs_<stat>`` composition (reference ``proarray.py:783``)."""
    example_name = "abs"

    def __init__(self, key: str, substat: StatisticBase):
        super().__init__(key)
        self._substat = substat

    @classmethod
    def valid(cls, key):
        k = key.lower()
        if k in ("abs", "abs_"):
            subkey = "mean"
        elif k.startswith("abs_"):
            subkey = k[4:]
        else:
            return None
        sub = get_statistic(subkey)
        if sub is None:
            return None
        return cls("abs_" + sub.key, sub)

    def compute(self, values, seg_ids, nbins, weights, mask):
        return self._substat.compute(jnp.abs(values), seg_ids, nbins,
                                     weights, mask)


class Dispersion(StatisticBase):
    example_name = "disp"

    @classmethod
    def valid(cls, key):
        return cls("disp") if key.lower() in ("disp", "dispersion") else None

    def compute(self, values, seg_ids, nbins, weights, mask):
        out = ops.segment_stat(values, seg_ids, nbins, "disp",
                               weights=weights, mask=mask)
        return self._nan_empty(out, seg_ids, nbins, mask)


class ProfileArray:
    """A per-particle field bound to a profile's binning.

    ``np.asarray(pa)`` / ``pa.values`` gives the default statistic
    (weighted mean, matching the reference default); ``pa["p16"]`` etc.
    computes any registered statistic, cached on the owning profile
    (reference ``proarray.py:93-117,456-488``).
    """

    def __init__(self, profile, name: str, values, units: Unit,
                 default_stat: str = "mean"):
        self._profile = profile
        self._name = name
        self._raw = values          # (N,) per-particle
        self.units = units if units is not None else dimensionless
        self._default_stat = default_stat

    # -- per-particle access ------------------------------------------------
    @property
    def particle_values(self):
        return self._raw

    # -- statistics --------------------------------------------------------------
    def stat(self, key: str) -> QArray:
        cache = self._profile._stats_cache.setdefault(self._name, {})
        inst = get_statistic(key)
        if inst is None:
            raise KeyError(f"unknown statistic {key!r} (examples: "
                           f"{[c.example_name for c in _STAT_CLASSES]})")
        if inst.key in cache:
            return cache[inst.key]
        bins = self._profile.bins
        w = self._profile._weight_values
        out = inst.compute(self._raw, bins.seg_ids, bins.nbins, w, bins.valid)
        units = self.units
        if inst.key == "sum_w" and w is not None:
            units = units * self._profile._weight_units
        q = QArray(out, units)
        cache[inst.key] = q
        return q

    def __getitem__(self, key: str) -> QArray:
        if not isinstance(key, str):
            raise TypeError("ProfileArray indices are statistic names")
        return self.stat(key)

    # -- default-stat array protocol ------------------------------------------
    @property
    def values(self) -> QArray:
        return self.stat(self._default_stat)

    def __array__(self, dtype=None):
        arr = np.asarray(self.values.value)
        return arr.astype(dtype) if dtype is not None else arr

    def __len__(self):
        return self._profile.bins.nbins

    @property
    def value(self):
        return self.values.value

    def in_units(self, target, **ctx):
        return self.values.in_units(target, **ctx)

    # arithmetic on the default statistic (delegates to QArray)
    def _q(self):
        return self.values

    def __add__(self, o):
        return self._q() + _unwrap(o)

    def __radd__(self, o):
        return _unwrap(o) + self._q()

    def __sub__(self, o):
        return self._q() - _unwrap(o)

    def __rsub__(self, o):
        return _unwrap(o) - self._q()

    def __mul__(self, o):
        return self._q() * _unwrap(o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        return self._q() / _unwrap(o)

    def __rtruediv__(self, o):
        return _unwrap(o) / self._q()

    def __pow__(self, p):
        return self._q() ** p

    def __repr__(self):
        return (f"<ProfileArray {self._name!r} nbins="
                f"{self._profile.bins.nbins} units='{self.units}'>")


def _unwrap(o):
    return o.values if isinstance(o, ProfileArray) else o
