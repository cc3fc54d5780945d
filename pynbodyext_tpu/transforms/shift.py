"""Translation transforms: recenter positions / velocities.

Reference counterpart: ``pynbodyext/transforms/shift.py`` (``ShiftPosTo``,
``ShiftVelTo``): a string mode auto-wraps the matching center calculator as a
dynamic dependency (measured in the current scope); explicit arrays /
callables / calculators are used directly.  The pynbody
``GenericTranslation`` handle becomes a pure ``pos − cen`` field override.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..core.calculate import Param, ParamView, TransformBase
from ..properties.generic import CenPos, CenVel
from ..quantity import QArray, strip_units

__all__ = ["ShiftPosTo", "ShiftVelTo"]

_POS_MODES = ("ssc", "com", "pot", "hyb")


@TransformBase.dataclass
class ShiftPosTo(TransformBase):
    """pos → pos − cen, where ``mode`` is 'ssc'/'com'/'pot'/'hyb' (wraps
    :class:`~..properties.CenPos`), an array, a callable or a calculator."""

    mode: Any = Param(default="ssc", units_of="pos")

    def __post_init__(self):
        if isinstance(self.mode, str):
            if self.mode not in _POS_MODES:
                raise ValueError(f"Invalid mode: {self.mode}. Expected one of "
                                 f"{list(_POS_MODES)}.")
            self.mode = CenPos(mode=self.mode)

    def apply(self, snapshot, params: ParamView):
        pos = snapshot["pos"]
        cen = jnp.asarray(strip_units(params.mode),
                          dtype=pos.value.dtype).reshape(3)
        return snapshot.with_fields(pos=QArray(pos.value - cen, pos.units))


@TransformBase.dataclass
class ShiftVelTo(TransformBase):
    """vel → vel − vcen; string mode 'com' wraps :class:`~..properties.CenVel`."""

    mode: Any = Param(default="com", units_of="vel")

    def __post_init__(self):
        if isinstance(self.mode, str):
            if self.mode != "com":
                raise ValueError(f"Invalid mode: {self.mode}. Expected 'com'.")
            self.mode = CenVel(mode=self.mode)

    def apply(self, snapshot, params: ParamView):
        vel = snapshot["vel"]
        vcen = jnp.asarray(strip_units(params.mode),
                           dtype=vel.value.dtype).reshape(3)
        return snapshot.with_fields(vel=QArray(vel.value - vcen, vel.units))
