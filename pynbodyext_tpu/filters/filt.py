"""Geometric / family / field-range filters.

Reference counterpart: ``pynbodyext/filters/filt.py`` (which wraps
``pynbody.filt``; mask conventions follow it: strict inequalities for
Band/High/Low-pass and Annulus, ``<`` for Sphere/Disc radii).  Here each
``build_mask`` is a handful of fused jnp ops over the flattened SoA; radii
and bounds accept floats, unit strings (coerced to the relevant field's
units), callables and calculators (resolved in the current scope,
reference ``filt.py:60``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..core.calculate import FilterBase, Param, ParamView
from ..quantity import QArray, strip_units
from ..units import UnitError, parse_unit

__all__ = ["VolumeFilter", "Sphere", "FamilyFilter", "Cuboid", "Disc",
           "BandPass", "HighPass", "LowPass", "Annulus", "SolarNeighborhood"]


def _cen3(cen) -> jnp.ndarray:
    return jnp.asarray(strip_units(cen), dtype=jnp.float32).reshape(3)


def _scalar(v):
    return strip_units(v)


class VolumeFilter(FilterBase):
    """Filter with an analytic volume (reference ``filt.py:33``)."""

    def volume(self, sim=None):
        raise NotImplementedError

    def _resolved(self, sim, name: str):
        from ..core.calculate.params import (StandaloneValueResolver,
                                             resolve_value_for)
        specs = self.param_specs()
        return resolve_value_for(self.param_values()[name], specs.get(name),
                                 StandaloneValueResolver(sim))


@VolumeFilter.dataclass
class Sphere(VolumeFilter):
    """|pos − cen| < radius (reference ``filt.py:41-66``)."""

    radius: Any = Param(units_of="pos")
    cen: Any = Param(default=(0.0, 0.0, 0.0), units_of="pos")

    def build_mask(self, sim, params: ParamView):
        pos = sim["pos"].value
        d = pos - _cen3(params.cen)
        r2 = jnp.sum(d * d, axis=-1)
        rad = _scalar(params.radius)
        return r2 < rad * rad

    def volume(self, sim=None):
        radius = self._resolved(sim, "radius")
        return 4.0 / 3.0 * np.pi * _scalar(radius) ** 3


@FilterBase.dataclass
class FamilyFilter(FilterBase):
    """Select one particle family (static slice → boolean mask)."""

    family: str = "star"

    def __post_init__(self):
        from ..snap.snapshot import FAMILY_ALIASES
        if callable(self.family):
            return
        if not isinstance(self.family, str) or self.family not in FAMILY_ALIASES:
            raise ValueError(f"invalid family {self.family!r}; expected one "
                             f"of {sorted(set(FAMILY_ALIASES.values()))} or an alias")

    def build_mask(self, sim, params: ParamView):
        fam = params.family
        if callable(fam):
            fam = fam(sim)
        return sim.family_mask(fam)


@VolumeFilter.dataclass
class Cuboid(VolumeFilter):
    """Axis-aligned cuboid; ``None`` upper corners mirror the lower ones,
    ``None`` y1/z1 default to x1 (pynbody Cuboid convention)."""

    x1: Any = Param(units_of="pos")
    y1: Any = Param(default=None, units_of="pos")
    z1: Any = Param(default=None, units_of="pos")
    x2: Any = Param(default=None, units_of="pos")
    y2: Any = Param(default=None, units_of="pos")
    z2: Any = Param(default=None, units_of="pos")

    @staticmethod
    def _corners(p):
        x1 = _scalar(p.x1)
        y1 = x1 if p.y1 is None else _scalar(p.y1)
        z1 = x1 if p.z1 is None else _scalar(p.z1)
        x2 = -x1 if p.x2 is None else _scalar(p.x2)
        y2 = -y1 if p.y2 is None else _scalar(p.y2)
        z2 = -z1 if p.z2 is None else _scalar(p.z2)
        return x1, y1, z1, x2, y2, z2

    def build_mask(self, sim, params: ParamView):
        x1, y1, z1, x2, y2, z2 = self._corners(params)
        pos = sim["pos"].value
        lo = jnp.asarray([min(x1, x2), min(y1, y2), min(z1, z2)],
                         dtype=pos.dtype)
        hi = jnp.asarray([max(x1, x2), max(y1, y2), max(z1, z2)],
                         dtype=pos.dtype)
        return jnp.all((pos > lo) & (pos < hi), axis=-1)

    def volume(self, sim=None):
        p = ParamView({k: self._resolved(sim, k)
                       for k in ("x1", "y1", "z1", "x2", "y2", "z2")})
        x1, y1, z1, x2, y2, z2 = self._corners(p)
        return abs((x2 - x1) * (y2 - y1) * (z2 - z1))


@VolumeFilter.dataclass
class Disc(VolumeFilter):
    """rxy < radius and |z| < height around ``cen`` (reference ``filt.py:120``)."""

    radius: Any = Param(units_of="pos")
    height: Any = Param(units_of="pos")
    cen: Any = Param(default=(0.0, 0.0, 0.0), units_of="pos")

    def build_mask(self, sim, params: ParamView):
        pos = sim["pos"].value - _cen3(params.cen)
        rxy2 = pos[..., 0] ** 2 + pos[..., 1] ** 2
        rad = _scalar(params.radius)
        h = _scalar(params.height)
        return (rxy2 < rad * rad) & (jnp.abs(pos[..., 2]) < h)

    def volume(self, sim=None):
        radius = _scalar(self._resolved(sim, "radius"))
        height = _scalar(self._resolved(sim, "height"))
        return 2 * np.pi * radius ** 2 * height


def _field_in_units(sim, prop: str, bound):
    """Coerce a bound (number / unit string / QArray) into field units."""
    if bound is None:
        return None
    if isinstance(bound, str):
        try:
            u = parse_unit(bound)
        except UnitError:
            raise ValueError(f"cannot parse bound {bound!r} as a unit")
        return u.ratio(sim[prop].units, **sim.units_context())
    if isinstance(bound, QArray):
        return bound.to_value(sim[prop].units, **sim.units_context())
    return strip_units(bound)


@FilterBase.dataclass
class BandPass(FilterBase):
    """min < field < max (strict, pynbody convention)."""

    prop: str = "r"
    min: Any = Param(default=None)
    max: Any = Param(default=None)

    def build_mask(self, sim, params: ParamView):
        x = sim[params.prop].value
        lo = _field_in_units(sim, params.prop, params.min)
        hi = _field_in_units(sim, params.prop, params.max)
        return (x > lo) & (x < hi)


@FilterBase.dataclass
class HighPass(FilterBase):
    """field > min."""

    prop: str = "r"
    min: Any = Param(default=None)

    def build_mask(self, sim, params: ParamView):
        x = sim[params.prop].value
        return x > _field_in_units(sim, params.prop, params.min)


@FilterBase.dataclass
class LowPass(FilterBase):
    """field < max."""

    prop: str = "r"
    max: Any = Param(default=None)

    def build_mask(self, sim, params: ParamView):
        x = sim[params.prop].value
        return x < _field_in_units(sim, params.prop, params.max)


@VolumeFilter.dataclass
class Annulus(VolumeFilter):
    """Spherical shell r1 < |pos − cen| < r2 (reference ``filt.py:173``)."""

    r1: Any = Param(units_of="pos")
    r2: Any = Param(units_of="pos")
    cen: Any = Param(default=(0.0, 0.0, 0.0), units_of="pos")

    def build_mask(self, sim, params: ParamView):
        pos = sim["pos"].value - _cen3(params.cen)
        r2sq = jnp.sum(pos * pos, axis=-1)
        a = _scalar(params.r1)
        b = _scalar(params.r2)
        return (r2sq > a * a) & (r2sq < b * b)

    def volume(self, sim=None):
        r1 = _scalar(self._resolved(sim, "r1"))
        r2 = _scalar(self._resolved(sim, "r2"))
        return 4.0 / 3.0 * np.pi * (r2 ** 3 - r1 ** 3)


@VolumeFilter.dataclass
class SolarNeighborhood(VolumeFilter):
    """Cylindrical annulus: r1 < rxy < r2 and |z| < height
    (reference ``filt.py:200``)."""

    r1: Any = Param(default="5 kpc", units_of="pos")
    r2: Any = Param(default="10 kpc", units_of="pos")
    height: Any = Param(default="2 kpc", units_of="pos")
    cen: Any = Param(default=(0.0, 0.0, 0.0), units_of="pos")

    def build_mask(self, sim, params: ParamView):
        pos = sim["pos"].value - _cen3(params.cen)
        rxy2 = pos[..., 0] ** 2 + pos[..., 1] ** 2
        a = _scalar(params.r1)
        b = _scalar(params.r2)
        h = _scalar(params.height)
        return (rxy2 > a * a) & (rxy2 < b * b) & (jnp.abs(pos[..., 2]) < h)

    def volume(self, sim=None):
        r1 = _scalar(self._resolved(sim, "r1"))
        r2 = _scalar(self._resolved(sim, "r2"))
        height = _scalar(self._resolved(sim, "height"))
        return 2 * np.pi * height * (r2 ** 2 - r1 ** 2)
