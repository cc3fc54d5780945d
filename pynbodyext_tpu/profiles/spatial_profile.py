"""Spatial (radial) profile presets and registered profile properties.

Reference counterpart: ``pynbodyext/profiles/spatial_profile.py``:
ndim=2 → (rxy, annulus); ndim=3 → (r, spherical_shell); properties
``density`` = Σmass/binsize, ``mass_enc`` cumulative, ``beta`` velocity
anisotropy (Binney & Tremaine 2008 eq. 4.61, RMS form including rotation).
"""

from __future__ import annotations

from typing import Any, Optional, Union

import jax.numpy as jnp

from ..log import logger
from ..quantity import QArray
from .bins import BinsSet
from .profile import Profile

__all__ = ["SpatialProfile", "RadialProfile"]


class SpatialProfile(Profile):
    pass


class RadialProfile(SpatialProfile):
    def __init__(self, sim, *, ndim: int = 3,
                 weight: Union[str, None, Any] = None,
                 bins_type="lin", nbins: int = 100,
                 bin_min: Optional[float] = None,
                 bin_max: Optional[float] = None,
                 bins_set: Optional[BinsSet] = None, **kwargs):
        if ndim == 2:
            bins_by, bins_area = "rxy", "annulus"
        elif ndim == 3:
            bins_by, bins_area = "r", "spherical_shell"
        else:
            raise ValueError("ndim must be 2 or 3")
        super().__init__(sim, weight=weight, bins_by=bins_by,
                         bins_area=bins_area, bins_type=bins_type,
                         nbins=nbins, bin_min=bin_min, bin_max=bin_max,
                         bins_set=bins_set, **kwargs)


@SpatialProfile.profile_property
def density(pro) -> QArray:
    return pro["mass"]["sum"] / pro.binsize


@SpatialProfile.profile_property
def mass_enc(pro) -> QArray:
    s = pro["mass"]["sum"]
    return QArray(jnp.cumsum(s.value), s.units)


@SpatialProfile.profile_property
def beta(pro) -> QArray:
    """Velocity anisotropy β = 1 − (V_φ² + V_θ²)/(2 V_r²)
    (Binney & Tremaine 2008 eq. 4.61; RMS form including rotation,
    reference ``spatial_profile.py:58-76``)."""
    if pro.bins.bins_by not in ("r",):
        logger.warning("Beta parameter is useful for spherical systems. "
                       "Consider using RadialProfile with ndim=3")
    vphi = pro["vphi"]["rms"]
    vtheta = pro["vtheta"]["rms"]
    vr = pro["vr"]["rms"]
    return 1.0 - (vphi ** 2 + vtheta ** 2) / (vr ** 2 * 2.0)
