"""Unit-carrying array: the TPU-native analogue of pynbody's ``SimArray``.

Reference counterpart: pynbody ``SimArray`` as used throughout
``/root/reference/pynbodyext`` (e.g. ``properties/base.py:83-103``,
``gravity/pyn_gravity.py:121``).  Design divergence (TPU-first):

* The payload is an **immutable** ``jax.Array`` (or numpy array on host);
  there is no in-place mutation, no ``sim`` backreference magic, no lazy
  ufunc registry.  Units ride along as a host-side :class:`~..units.Unit`
  and never enter traced code.
* Inside jitted kernels we always work on raw ``.value`` arrays; ``QArray``
  is the boundary type used by the calculator layer and user-facing results.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from .units import Unit, UnitLike, dimensionless, parse_unit

__all__ = ["QArray", "qarray", "strip_units", "attach_units"]


def _unit_of(x) -> Unit:
    return x.units if isinstance(x, QArray) else dimensionless


def _value_of(x):
    return x.value if isinstance(x, QArray) else x


class QArray:
    """``value`` (jax/numpy array or scalar) + ``units`` (:class:`Unit`)."""

    __slots__ = ("value", "units")

    def __init__(self, value: Any, units: UnitLike = None):
        if isinstance(value, QArray):
            if units is None:
                units = value.units
            value = value.value
        object.__setattr__(self, "value", value)
        object.__setattr__(self, "units", parse_unit(units))

    def __setattr__(self, *_):  # pragma: no cover
        raise AttributeError("QArray is immutable")

    def __reduce__(self):  # picklable despite the immutability guard
        import numpy as _np
        return (QArray, (_np.asarray(self.value), self.units))

    # -- conversions --------------------------------------------------------
    def in_units(self, target: UnitLike, **context: float) -> "QArray":
        factor = self.units.ratio(target, **context)
        tgt = parse_unit(target)
        if factor == 1.0:
            return QArray(self.value, tgt)
        return QArray(self.value * factor, tgt)

    def to_value(self, target: UnitLike, **context: float):
        """Raw array expressed in ``target`` units (drops the wrapper)."""
        factor = self.units.ratio(target, **context)
        return self.value if factor == 1.0 else self.value * factor

    def with_units(self, units: UnitLike) -> "QArray":
        """Relabel units without rescaling."""
        return QArray(self.value, units)

    # -- array protocol -------------------------------------------------------
    def __array__(self, dtype=None):
        arr = np.asarray(self.value)
        return arr.astype(dtype) if dtype is not None else arr

    @property
    def shape(self):
        return jnp.shape(self.value)

    @property
    def ndim(self):
        return jnp.ndim(self.value)

    @property
    def dtype(self):
        return jnp.asarray(self.value).dtype if not hasattr(self.value, "dtype") else self.value.dtype

    @property
    def size(self):
        return int(np.prod(self.shape)) if self.shape else 1

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, idx) -> "QArray":
        return QArray(self.value[idx], self.units)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def __float__(self):
        return float(self.value)

    def __int__(self):
        return int(self.value)

    def __bool__(self):
        return bool(self.value)

    # -- arithmetic -----------------------------------------------------------
    def _add_like(self, other, sign: int) -> "QArray":
        ou, ov = _unit_of(other), _value_of(other)
        if isinstance(other, QArray) and not self.units.dimensionless:
            # convert other into self's units (pynbody-compatible behaviour)
            ov = ov * ou.ratio(self.units)
        elif isinstance(other, QArray) and self.units.dimensionless:
            return QArray(self.value + sign * ov, ou)
        return QArray(self.value + sign * ov, self.units)

    def __add__(self, other):
        return self._add_like(other, +1)

    __radd__ = __add__

    def __sub__(self, other):
        return self._add_like(other, -1)

    def __rsub__(self, other):
        return (-self)._add_like(other, +1)

    def __neg__(self):
        return QArray(-self.value, self.units)

    def __abs__(self):
        return QArray(jnp.abs(self.value), self.units)

    def __mul__(self, other):
        return QArray(self.value * _value_of(other), self.units * _unit_of(other))

    __rmul__ = __mul__

    def __truediv__(self, other):
        return QArray(self.value / _value_of(other), self.units / _unit_of(other))

    def __rtruediv__(self, other):
        return QArray(_value_of(other) / self.value, _unit_of(other) / self.units)

    def __pow__(self, p):
        return QArray(self.value ** p, self.units ** p)

    # -- comparisons (same-dimension aware) ------------------------------------
    def _cmp_value(self, other):
        if isinstance(other, QArray):
            return other.to_value(self.units)
        return other

    def __lt__(self, other):
        return self.value < self._cmp_value(other)

    def __le__(self, other):
        return self.value <= self._cmp_value(other)

    def __gt__(self, other):
        return self.value > self._cmp_value(other)

    def __ge__(self, other):
        return self.value >= self._cmp_value(other)

    def __eq__(self, other):
        if isinstance(other, (QArray, int, float, np.ndarray)) or hasattr(other, "shape"):
            return self.value == self._cmp_value(other)
        return NotImplemented

    def __ne__(self, other):
        eq = self.__eq__(other)
        return NotImplemented if eq is NotImplemented else ~eq if hasattr(eq, "__invert__") else not eq

    def __hash__(self):
        return id(self)

    # -- reductions -------------------------------------------------------------
    def sum(self, axis=None):
        return QArray(jnp.sum(self.value, axis=axis), self.units)

    def mean(self, axis=None):
        return QArray(jnp.mean(self.value, axis=axis), self.units)

    def min(self, axis=None):
        return QArray(jnp.min(self.value, axis=axis), self.units)

    def max(self, axis=None):
        return QArray(jnp.max(self.value, axis=axis), self.units)

    # -- repr ---------------------------------------------------------------------
    def __repr__(self):
        u = str(self.units)
        return f"QArray({np.asarray(self.value)!r}, '{u}')"


def qarray(value, units: UnitLike = None) -> QArray:
    return QArray(value, units)


def strip_units(x):
    """Raw array from QArray-or-array."""
    return x.value if isinstance(x, QArray) else x


def attach_units(x, units: UnitLike) -> QArray:
    return QArray(strip_units(x), units)
