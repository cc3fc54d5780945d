"""pynbodyext_tpu — TPU-native particle-analysis engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``wx-ys/pynbody-extras`` (reference mounted at ``/root/reference``):
lazy calculator graphs (properties / filters / transforms), radial profiles
with device-side statistics, direct-sum + tree gravity as Pallas kernels,
and mesh-sharded execution over TPU pods.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

* :mod:`~pynbodyext_tpu.snap` — immutable HBM-resident SoA snapshots
* :mod:`~pynbodyext_tpu.units` / :mod:`~pynbodyext_tpu.quantity` — host-side units
* :mod:`~pynbodyext_tpu.core.calculate` — the calculator engine
* :mod:`~pynbodyext_tpu.properties` / ``filters`` / ``transforms`` — domain calculators
* :mod:`~pynbodyext_tpu.profiles` — binned profiles & statistics
* :mod:`~pynbodyext_tpu.gravity` — Pallas gravity solvers
* :mod:`~pynbodyext_tpu.ops` — raw jnp/lax compute primitives
* :mod:`~pynbodyext_tpu.parallel` — mesh sharding & collectives
* :mod:`~pynbodyext_tpu.chunk` — host-streamed out-of-core execution
"""

__version__ = "0.1.0"

from . import log, ops, units
from .quantity import QArray, qarray
from .snap import (ParticleView, Snapshot, SubfindCatalog, from_pynbody,
                   load_gadget_binary, load_gadget_hdf5, load_subfind_hdf5,
                   load_via_pynbody, make_adversarial_galaxy, make_test_galaxy,
                   save_gadget_binary,
                   save_gadget_hdf5)
from .units import G, Unit, parse_unit

from . import calculate
from .filters import (Annulus, BandPass, Cuboid, Disc, FamilyFilter,
                      HighPass, LowPass, SolarNeighborhood, Sphere)
from .properties import (AngMomVec, CenPos, CenVel, KappaRot, KappaRotMean,
                         ParamContain, ParamSum, PatternSpeed,
                         RadiusAtSurfaceDensity, SpinParam, SurfaceDensity,
                         VirialRadius, VolumeDensity)
from .transforms import AlignAngMomVec, AlignVec, ShiftPosTo, ShiftVelTo, WrapBox

__all__ = [
    "__version__",
    "QArray", "qarray", "Unit", "parse_unit", "G", "units",
    "Snapshot", "ParticleView",
    "load_gadget_hdf5", "save_gadget_hdf5", "make_test_galaxy",
    "make_adversarial_galaxy",
    "load_gadget_binary", "save_gadget_binary", "from_pynbody",
    "SubfindCatalog", "load_subfind_hdf5",
    "load_via_pynbody",
    "ops", "log", "calculate",
    # filters
    "Sphere", "FamilyFilter", "Cuboid", "Disc", "Annulus", "BandPass",
    "HighPass", "LowPass", "SolarNeighborhood",
    # properties
    "ParamSum", "ParamContain", "VolumeDensity", "SurfaceDensity",
    "RadiusAtSurfaceDensity", "CenPos", "CenVel", "AngMomVec", "KappaRot",
    "KappaRotMean", "VirialRadius", "SpinParam", "PatternSpeed",
    # transforms
    "ShiftPosTo", "ShiftVelTo", "AlignVec", "AlignAngMomVec", "WrapBox",
]
