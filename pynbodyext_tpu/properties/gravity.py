"""Gravity as calculator-graph nodes.

The reference exposes gravity only as snapshot-level helpers
(``pyn_gravity.py``); here the solvers also participate in the calculator
DAG, so potentials compose with filters/transforms/caching like any other
property:

>>> phi = GravPotential(softening="0.1 kpc").transform(ShiftPosTo("ssc"))
>>> pot_min = CenPos("pot")  # can then consume the phi field
"""

from __future__ import annotations

from typing import Any

from ..core.calculate import CachePolicy, Param, ParamView, PropertyBase
from ..gravity.api import calculate_acceleration, calculate_potential

__all__ = ["GravPotential", "GravAcceleration"]


@PropertyBase.dataclass
class GravPotential(PropertyBase):
    """Per-particle gravitational potential (km² s⁻²) of the active view."""

    softening: Any = Param(default=None, units_of="pos")
    kernel: Any = Param(default=None, static=True)
    method: str = "direct"
    theta: float = 0.7

    # O(N²)/O(N log N) work: worth keeping for the whole run
    cache_policy = CachePolicy.FULL

    def calculate(self, sim, params: ParamView):
        return calculate_potential(sim, softening=params.softening,
                                   kernel=params.kernel,
                                   method=params.method, theta=params.theta)


@PropertyBase.dataclass
class GravAcceleration(PropertyBase):
    """Per-particle gravitational acceleration (km s⁻²) of the active view."""

    softening: Any = Param(default=None, units_of="pos")
    kernel: Any = Param(default=None, static=True)
    method: str = "direct"
    theta: float = 0.7

    cache_policy = CachePolicy.FULL

    def calculate(self, sim, params: ParamView):
        return calculate_acceleration(sim, softening=params.softening,
                                      kernel=params.kernel,
                                      method=params.method,
                                      theta=params.theta)
