"""Time-binned profiles (stellar-age histories).

Reference counterpart: ``pynbodyext/profiles/time_profile.py``:
``StarAgeProfile`` bins star particles by age with mass weighting;
``sfr`` = Σ mass / bin width.
"""

from __future__ import annotations

from typing import Any, Optional, Union

from ..quantity import QArray
from .bins import BinsSet
from .profile import Profile

__all__ = ["TimeProfile", "StarAgeProfile"]


class TimeProfile(Profile):
    pass


class StarAgeProfile(TimeProfile):
    def __init__(self, sim, *, weight: Union[str, None, Any] = "mass",
                 bins_type="lin", nbins: int = 100,
                 bin_min: Optional[float] = None,
                 bin_max: Optional[float] = None,
                 bins_set: Optional[BinsSet] = None, **kwargs):
        stars = sim.families("star")
        if len(stars) <= 0:
            raise ValueError("Simulation snapshot contains no star particles")
        super().__init__(stars, weight=weight, bins_by="age",
                         bins_area="length", bins_type=bins_type,
                         nbins=nbins, bin_min=bin_min, bin_max=bin_max,
                         bins_set=bins_set, **kwargs)


@StarAgeProfile.profile_property
def sfr(pro) -> QArray:
    """Star-formation rate per age bin: Σ mass / Δt
    (reference ``time_profile.py:44``)."""
    return pro["mass"]["sum"] / pro.binsize
