"""Device mesh construction and snapshot sharding."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quantity import QArray
from ..snap.snapshot import Snapshot

__all__ = ["make_mesh", "shard_snapshot", "pad_to_devices", "PARTICLE_AXIS"]

#: canonical particle-axis name (the "dp" axis of this domain)
PARTICLE_AXIS = "p"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = PARTICLE_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def pad_to_devices(x, mesh: Mesh, fill=0.0,
                   axis_name: str = PARTICLE_AXIS):
    """Pad the leading axis to a multiple of the mesh axis size."""
    n_dev = mesh.shape[axis_name]
    n = x.shape[0]
    n_pad = -(-n // n_dev) * n_dev
    if n_pad == n:
        return x
    width = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, width, constant_values=fill)


def shard_snapshot(snap: Snapshot, mesh: Mesh,
                   axis_name: str = PARTICLE_AXIS) -> Snapshot:
    """Place every loaded field with a particle-axis NamedSharding.

    Family slices and masks are positional, so they remain valid — the
    arrays are merely laid out across chips.  Downstream jnp reductions in
    the calculator engine auto-parallelize via GSPMD (psum over ICI);
    nothing else changes.
    """
    fields = {}
    for name in snap.loaded_fields:
        q = snap[name]
        spec = P(axis_name) if q.value.ndim == 1 else P(
            axis_name, *([None] * (q.value.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        fields[name] = QArray(jax.device_put(q.value, sharding), q.units)
    return Snapshot(fields, snap.family_slices, snap.properties)
