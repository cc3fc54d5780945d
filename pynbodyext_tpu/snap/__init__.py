"""Snapshot data model: immutable HBM-resident structure-of-arrays.

TPU-native replacement for the reference's pynbody ``SimSnap`` substrate
(reference layer 0, SURVEY.md §1).
"""

from .snapshot import Snapshot, ParticleView, SnapLike, derived_field
from . import derived as _derived  # noqa: F401  (registers built-in derived fields)
from .halos import HaloCatalog
from .gadget_binary import load_gadget_binary, save_gadget_binary
from .loaders import (load_gadget_hdf5, make_adversarial_galaxy,
                      make_test_galaxy, save_gadget_hdf5)
from .pynbody_adapter import from_pynbody, load_via_pynbody
from .subfind import SubfindCatalog, load_subfind_hdf5

__all__ = [
    "Snapshot",
    "ParticleView",
    "SnapLike",
    "derived_field",
    "HaloCatalog",
    "load_gadget_hdf5",
    "load_gadget_binary",
    "save_gadget_binary",
    "from_pynbody",
    "SubfindCatalog",
    "load_subfind_hdf5",
    "load_via_pynbody",
    "save_gadget_hdf5",
    "make_test_galaxy",
    "make_adversarial_galaxy",
]
