"""Multi-chip execution: device meshes, sharded snapshots, ring collectives.

The reference's parallelism story is rayon threads + dask chunking
(SURVEY.md §2.7); the TPU-native equivalent is a 1-D device mesh over the
particle axis.  Three tiers:

* **Automatic (GSPMD):** :func:`shard_snapshot` places every field with a
  ``NamedSharding`` over the particle axis; every jnp reduction in the
  calculator pipeline then auto-parallelizes (psum over ICI) with no code
  changes.
* **Ring direct-sum:** :func:`ring_direct_potentials` /
  :func:`ring_direct_accelerations` — targets sharded, source blocks rotate
  around the ICI ring via ``lax.ppermute`` while each chip runs the Pallas
  tile kernel on its resident targets (the ring-attention schedule applied
  to gravity, SURVEY.md §5).
* **Helpers:** :func:`make_mesh`, :func:`pad_to_devices`.
"""

from .mesh import make_mesh, pad_to_devices, shard_snapshot, PARTICLE_AXIS
from .gravity_grid import (grid_direct_accelerations, grid_direct_potentials,
                           make_mesh_2d)
from .gravity_ring import ring_direct_accelerations, ring_direct_potentials

__all__ = ["make_mesh", "make_mesh_2d", "shard_snapshot", "pad_to_devices",
           "PARTICLE_AXIS",
           "ring_direct_potentials", "ring_direct_accelerations",
           "grid_direct_potentials", "grid_direct_accelerations"]
