"""Concrete property calculators.

Reference counterpart: ``pynbodyext/properties``.
"""

from .base import (ParamContain, ParamSum, RadiusAtSurfaceDensity,
                   SurfaceDensity, VolumeDensity)
from .generic import (AngMomVec, CenPos, CenVel, KappaRot, KappaRotMean,
                      PatternSpeed, SpinParam, VirialRadius)
from .gravity import GravAcceleration, GravPotential

__all__ = [
    "ParamSum", "ParamContain", "VolumeDensity", "SurfaceDensity",
    "RadiusAtSurfaceDensity",
    "CenPos", "CenVel", "AngMomVec", "KappaRot", "KappaRotMean",
    "VirialRadius", "SpinParam", "PatternSpeed",
    "GravPotential", "GravAcceleration",
]
