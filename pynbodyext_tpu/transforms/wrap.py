"""Periodic-box wrapping transform.

Reference counterpart: ``pynbodyext/transforms/wrap.py`` (``WrapBox`` /
``WrapTransformation``): wrap positions into the box via integer offsets
``k`` per axis (pos − k·L).  The reference stores int8 ``k`` counters so it
can revert in place without a float64 copy (``wrap.py:18-107``); with
immutable frames no counters are needed — revert is the previous snapshot.

Conventions (reference ``wrap.py:161-213``):

* ``center``  → wrap into [−L/2, L/2)
* ``upper``   → wrap into [0, L)
* ``minirange`` → per axis, pick whichever of the two gives the smaller
  coordinate range (useful for objects straddling a box edge).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core.calculate import Param, ParamView, TransformBase
from ..log import logger
from ..quantity import QArray, strip_units
from ..units import parse_unit

__all__ = ["WrapBox"]

_CONVENTIONS = ("center", "upper", "minirange")


def _wrap_once(pos, L, lower):
    k = jnp.floor((pos - lower) / L)
    return pos - k * L


@jax.jit
def _wrap_center(p, L):
    return _wrap_once(p, L, -0.5 * L)


@jax.jit
def _wrap_upper(p, L):
    return _wrap_once(p, L, 0.0)


@jax.jit
def _wrap_minirange(p, L):
    wc = _wrap_once(p, L, -0.5 * L)
    wu = _wrap_once(p, L, 0.0)
    range_c = jnp.max(wc, axis=0) - jnp.min(wc, axis=0)
    range_u = jnp.max(wu, axis=0) - jnp.min(wu, axis=0)
    return jnp.where(range_c <= range_u, wc, wu)


@TransformBase.dataclass
class WrapBox(TransformBase):
    """Wrap positions into the periodic box (no-op with a warning when the
    snapshot has no boxsize, reference ``wrap.py:128-147``)."""

    boxsize: Any = Param(default=None, units_of="pos")
    convention: str = "center"

    def __post_init__(self):
        if self.convention not in _CONVENTIONS:
            raise ValueError(f"Unknown wrapping convention "
                             f"{self.convention!r}; expected one of "
                             f"{list(_CONVENTIONS)}")

    def _resolve_boxsize(self, snapshot, params: ParamView) -> Optional[float]:
        L = params.boxsize
        if L is None:
            box = snapshot.properties.get("boxsize")
            if box is None:
                return None
            if isinstance(box, QArray):
                return float(box.to_value(snapshot["pos"].units,
                                          **snapshot.units_context()))
            return float(strip_units(box))
        if isinstance(L, str):
            return float(parse_unit(L).ratio(snapshot["pos"].units,
                                             **snapshot.units_context()))
        if isinstance(L, QArray):
            return float(L.to_value(snapshot["pos"].units,
                                    **snapshot.units_context()))
        return float(strip_units(L))

    def apply(self, snapshot, params: ParamView):
        L = self._resolve_boxsize(snapshot, params)
        if L is None:
            logger.warning("wrap: no boxsize specified and snapshot has no "
                           "'boxsize' property; skipping wrap")
            return snapshot
        if L <= 0:
            logger.warning("wrap: boxsize must be positive, got %s; "
                           "skipping wrap", L)
            return snapshot
        pos = snapshot["pos"]
        p = pos.value
        if self.convention == "center":
            new = _wrap_center(p, L)
        elif self.convention == "upper":
            new = _wrap_upper(p, L)
        else:  # minirange: per axis, smaller resulting range wins
            new = _wrap_minirange(p, L)
        return snapshot.with_fields(pos=QArray(new, pos.units))
