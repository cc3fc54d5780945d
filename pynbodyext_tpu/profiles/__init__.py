"""Binned profiles with device-side statistics.

Reference counterpart: ``pynbodyext/profiles`` (SURVEY.md §2.3).  The
per-bin Python loops (``proarray.py:272-334``) become one sort + segment
reductions (:mod:`..ops.segment`).
"""

from .bins import BinsSet, MaterializedBins
from .profile import Profile, ProfileBase, SubProfile
from .proarray import ProfileArray, StatisticBase, get_statistic
from .base import ProfileBuilderBase, RadialProfileBuilder
from .spatial_profile import RadialProfile, SpatialProfile
from .time_profile import StarAgeProfile, TimeProfile

__all__ = [
    "BinsSet", "MaterializedBins",
    "Profile", "SubProfile", "ProfileBase",
    "ProfileArray", "StatisticBase", "get_statistic",
    "ProfileBuilderBase", "RadialProfileBuilder",
    "RadialProfile", "SpatialProfile", "StarAgeProfile", "TimeProfile",
]
