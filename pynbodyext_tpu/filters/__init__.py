"""Geometric and family filters as calculator nodes.

Reference counterpart: ``pynbodyext/filters`` (`filt.py`, `pynfilt.py`).
Masks are built directly in jnp (no pynbody delegation) and fuse into
downstream reductions.
"""

from .filt import (Annulus, BandPass, Cuboid, Disc, FamilyFilter, HighPass,
                   LowPass, SolarNeighborhood, Sphere, VolumeFilter)

__all__ = ["Sphere", "FamilyFilter", "Cuboid", "Disc", "Annulus", "BandPass",
           "HighPass", "LowPass", "SolarNeighborhood", "VolumeFilter"]
