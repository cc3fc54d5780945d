"""Profile builders: profile construction as calculator graph nodes.

Reference counterpart: ``pynbodyext/profiles/base.py``
(``ProfileBuilderBase(CalculatorBase)``, ``RadialProfileBuilder`` with
dynamic bin_min/bin_max).  A builder evaluated inside a run participates in
caching / scoping like any node: ``RadialProfileBuilder(...)
.filter(Sphere(...)).transform(ShiftPosTo("ssc"))(sim)`` yields a Profile
over the transformed, filtered view.
"""

from __future__ import annotations

from typing import Any

from ..core.calculate import BuiltinKinds, CachePolicy, Param, ParamView, PropertyBase
from .spatial_profile import RadialProfile

__all__ = ["ProfileBuilderBase", "RadialProfileBuilder"]


class ProfileBuilderBase(PropertyBase):
    """Base for profile-building nodes (reference ``profiles/base.py:59``)."""

    node_kind = BuiltinKinds.PROFILE
    # a Profile holds device arrays + caches; don't duplicate in the run cache
    cache_policy = CachePolicy.NONE

    def build_profile(self, sim, params: ParamView):
        raise NotImplementedError

    def calculate(self, sim, params: ParamView):
        return self.build_profile(sim, params)


@ProfileBuilderBase.dataclass
class RadialProfileBuilder(ProfileBuilderBase):
    """Build a :class:`~.spatial_profile.RadialProfile`
    (reference ``profiles/base.py:77-140``); ``bin_min``/``bin_max`` accept
    dynamic values (unit strings, callables, calculators)."""

    ndim: int = 3
    weight: Any = Param(default=None, static=True)
    bins_type: Any = Param(default="lin", static=True)
    nbins: int = 100
    bin_min: Any = Param(default=None, units_of="pos")
    bin_max: Any = Param(default=None, units_of="pos")

    def __post_init__(self):
        if self.ndim not in (2, 3):
            raise ValueError("ndim must be 2 or 3")

    def build_profile(self, sim, params: ParamView):
        from ..quantity import strip_units
        bin_min = params.bin_min
        bin_max = params.bin_max
        return RadialProfile(
            sim, ndim=params.ndim, weight=params.weight,
            bins_type=params.bins_type, nbins=params.nbins,
            bin_min=None if bin_min is None else float(strip_units(bin_min)),
            bin_max=None if bin_max is None else float(strip_units(bin_max)))
