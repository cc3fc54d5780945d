"""Rotation transforms: align a vector with the z-axis.

Reference counterpart: ``pynbodyext/transforms/rotate.py`` (``AlignVec``
with calculator-valued vectors, safe-up selection; pre-built
``AlignAngMomVec``).  The rotation applies to both positions and velocities
as one MXU matmul each.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..core.calculate import Param, ParamView, TransformBase
from ..ops.geometry import apply_rotation, faceon_matrix
from ..properties.generic import AngMomVec
from ..quantity import QArray, strip_units

__all__ = ["AlignVec", "AlignAngMomVec"]


@TransformBase.dataclass
class AlignVec(TransformBase):
    """Rotate the frame so ``vector`` points along +z.

    ``vector`` may be an array, callable, or calculator (e.g.
    ``AngMomVec()`` — evaluated on the current frame/scope).  ``up`` fixes
    the in-plane orientation; when None (or parallel to the vector) a safe
    axis is chosen (reference ``rotate.py:57-98``).
    """

    vector: Any = Param(default=None)
    up: Any = Param(default=None, static=True)

    def __post_init__(self):
        if self.vector is None:
            self.vector = AngMomVec()

    def apply(self, snapshot, params: ParamView):
        vec = strip_units(params.vector)
        if isinstance(vec, (list, tuple, np.ndarray)) or np.ndim(vec) == 0:
            # host-provided vector: validate eagerly (reference raises)
            vec = np.asarray(vec, dtype=float)
            if np.isnan(vec).any() or np.linalg.norm(vec) == 0:
                raise ValueError(f"alignment vector is zero or NaN: {vec}")
        # device-resident vectors (e.g. an AngMomVec dependency) are NOT
        # synced here: a host readback per phase costs a full relay round
        # trip (~29 ms) and breaks async chaining — an invalid vector
        # surfaces as NaNs at the result sync instead
        # keep the incoming dtype: forcing f32 here broke f64 engine-vs-
        # fused parity at the 1e-12 golden bar (x64 runs must stay x64)
        matrix = faceon_matrix(jnp.asarray(vec),
                               None if params.up is None
                               else jnp.asarray(params.up))
        pos = snapshot["pos"]
        updates = {"pos": QArray(apply_rotation(pos.value,
                                                matrix.astype(pos.value.dtype)),
                                 pos.units)}
        if snapshot.has_field("vel"):
            vel = snapshot["vel"]
            updates["vel"] = QArray(
                apply_rotation(vel.value, matrix.astype(vel.value.dtype)),
                vel.units)
        return snapshot.with_fields(**updates)


def AlignAngMomVec() -> AlignVec:
    """Align the (scope-measured) angular momentum with +z
    (reference module-level instance, ``rotate.py:101``)."""
    return AlignVec(AngMomVec())
