"""Aggregate property calculators: sums, containment radii, densities.

Reference counterpart: ``pynbodyext/properties/base.py``.  The numpy
argsort/cumsum/interp hot loops become device-side sorted reductions from
:mod:`..ops` — one fused XLA program per property, mask-aware instead of
gather-based.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from .. import ops
from ..chunk.stream import is_streaming_array
from ..core.calculate import Param, ParamView, PropertyBase
from ..quantity import QArray, strip_units

__all__ = ["ParamSum", "ParamContain", "VolumeDensity", "SurfaceDensity",
           "RadiusAtSurfaceDensity"]


def _normalize_frac(frac):
    """Validate fractions ∈ (0,1); returns (array, was_scalar)
    (reference ``properties/base.py:54-59``)."""
    scalar = isinstance(frac, (int, float, np.floating))
    arr = np.asarray([frac] if scalar else frac, dtype=float)
    if arr.ndim != 1:
        raise ValueError("frac must be a scalar or 1D sequence")
    if not np.all((arr > 0) & (arr < 1)):
        raise ValueError(f"frac values must be in (0, 1), got {arr}")
    return arr, scalar


@PropertyBase.dataclass
class ParamSum(PropertyBase):
    """Sum of a field over the active (masked) view
    (reference ``properties/base.py:106``)."""

    parameter: str = "mass"

    def calculate(self, sim, params: ParamView):
        q = sim[params.parameter]
        if is_streaming_array(q):
            # chunked snapshot: mask-aware streaming reduction, one chunk
            # resident at a time (reference runs calculators on dask-lazy
            # ChunkSimSnaps, ``chunk/chunksnap.py:84-121``)
            return q.sum()
        return QArray(ops.msum(q.value, sim.mask), q.units)


@PropertyBase.dataclass
class ParamContain(PropertyBase):
    """Containment radius at cumulative weight fraction(s)
    (reference ``properties/base.py:60-103``): argsort by ``cal_key``,
    normalized cumsum of ``parameter``, interp.  Scalar or vector ``frac``.
    """

    # positional order follows the public convention used by the reference
    # README/tests: ParamContain("r", 0.5, "mass")
    cal_key: str = "r"
    frac: Any = Param(default=0.5)
    parameter: str = "mass"

    def calculate(self, sim, params: ParamView):
        frac_arr, scalar = _normalize_frac(params.frac)
        key = sim[params.cal_key]
        weight = sim[params.parameter]
        if is_streaming_array(key):
            # chunked: stream-concatenate just the two selected (N,)
            # columns (≪ the snapshot) and run the exact sorted CDF
            kv = key.compute().value
            vals = ops.containment_radius(kv, jnp.asarray(frac_arr),
                                          weight.compute().value)
            return self._finish(vals, scalar, key.units, params)
        vals = ops.containment_radius(key.value, jnp.asarray(frac_arr),
                                      weight.value, mask=sim.mask)
        return self._finish(vals, scalar, key.units, params)

    @staticmethod
    def _finish(vals, scalar, units, params):
        if not bool(jnp.all(jnp.isfinite(vals))):
            # matches the reference's guard (properties/base.py:92):
            # empty selection / non-positive total weight
            raise ValueError(
                f"Non-positive total {params.parameter!r} in the current "
                "selection; cannot compute containment radius.")
        out = vals[0] if scalar else vals
        return QArray(out, units)


@PropertyBase.dataclass
class VolumeDensity(PropertyBase):
    """Mean density in the spherical shell (rmin, rmax): Σ parameter /
    (4/3 π (rmax³−rmin³)) (reference ``properties/base.py:121``)."""

    rmax: Any = Param(units_of="pos")
    parameter: str = "mass"
    rmin: Any = Param(default=0.0, units_of="pos")

    def calculate(self, sim, params: ParamView):
        r = sim["r"].value
        rmin = strip_units(params.rmin)
        rmax = strip_units(params.rmax)
        shell = (r > rmin) & (r < rmax)
        mask = shell if sim.mask is None else jnp.logical_and(sim.mask, shell)
        q = sim[params.parameter]
        total = ops.msum(q.value, mask)
        volume = 4.0 / 3.0 * np.pi * (rmax ** 3 - rmin ** 3)
        return QArray(total / volume, q.units / sim["pos"].units ** 3)


@PropertyBase.dataclass
class SurfaceDensity(PropertyBase):
    """Mean surface density in the cylindrical annulus rmin < rxy < rmax:
    Σ parameter / (π (rmax²−rmin²)) (reference ``properties/base.py:144``)."""

    rmax: Any = Param(units_of="pos")
    rmin: Any = Param(default=0.0, units_of="pos")
    parameter: str = "mass"

    def calculate(self, sim, params: ParamView):
        rxy = sim["rxy"].value
        rmin = strip_units(params.rmin)
        rmax = strip_units(params.rmax)
        band = (rxy > rmin) & (rxy < rmax)
        mask = band if sim.mask is None else jnp.logical_and(sim.mask, band)
        q = sim[params.parameter]
        total = ops.msum(q.value, mask)
        area = np.pi * (rmax ** 2 - rmin ** 2)
        return QArray(total / area, q.units / sim["pos"].units ** 2)


@PropertyBase.dataclass
class RadiusAtSurfaceDensity(PropertyBase):
    """Radius where the surface density reaches ``target``
    (reference ``properties/base.py:172-284``): 256-point grid bracket +
    bisection, modes 'shell' (local annulus of width eps) and 'total'
    (Σ(<r) = M(<r)/πr²)."""

    target: Any = Param()
    parameter: str = "mass"
    mode: str = "shell"
    r_key: str = "rxy"
    eps: float = 0.01

    def calculate(self, sim, params: ParamView):
        q = sim[params.parameter]
        r = sim[params.r_key]
        surf_units = q.units / sim["pos"].units ** 2
        target = params.target
        if isinstance(target, str):
            from ..units import parse_unit
            target = parse_unit(target).ratio(surf_units,
                                              **sim.units_context())
        elif isinstance(target, QArray):
            target = target.to_value(surf_units, **sim.units_context())
        root = ops.radius_at_surface_density(
            r.value, q.value, strip_units(target), mask=sim.mask,
            eps=params.eps, mode=params.mode)
        return QArray(root, r.units)
