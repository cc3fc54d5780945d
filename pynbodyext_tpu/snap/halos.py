"""Halo catalogs as mask families over a group-id field.

The reference's test workloads revolve around subhalo catalogs
(``tests/conftest.py:45-56``: subfind halos, ``halos[0]`` as a sub-snapshot)
— the catalog machinery itself lives in pynbody.  TPU-native equivalent: a
halo is a boolean mask derived from a per-particle group-id field, so
``halos[0]`` composes with every filter/transform/profile like any other
view, and per-halo statistics run as one segment reduction over the whole
snapshot instead of a Python loop over halos.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import ops
from ..quantity import QArray
from .snapshot import ParticleView, Snapshot

__all__ = ["HaloCatalog"]


class HaloCatalog:
    """Catalog over a per-particle integer group id.

    Parameters
    ----------
    snap : Snapshot
        Source snapshot with a group-id field.
    grp_field : str
        Field holding the halo id per particle (``-1`` or ``unassigned_id``
        marks ungrouped particles).
    unassigned : int
        Id value meaning "in no halo".
    """

    def __init__(self, snap: Snapshot, grp_field: str = "grp",
                 unassigned: int = -1):
        self.snap = snap
        self.grp_field = grp_field
        self.unassigned = int(unassigned)
        grp = snap[grp_field].value.astype(jnp.int32)
        self._grp = grp
        valid = grp != self.unassigned
        self._n_halos = int(jnp.max(jnp.where(valid, grp, -1))) + 1
        # particle counts per halo: one segment reduction
        safe = jnp.where(valid, grp, 0)
        self._counts = np.asarray(ops.segment_counts(
            safe, max(self._n_halos, 1), mask=valid))

    def __len__(self) -> int:
        return self._n_halos

    def __getitem__(self, i: int) -> ParticleView:
        if not 0 <= i < self._n_halos:
            raise IndexError(f"halo {i} out of range [0, {self._n_halos})")
        return self.snap[self._grp == i]

    def __iter__(self):
        for i in range(self._n_halos):
            yield self[i]

    @property
    def counts(self) -> np.ndarray:
        """Particles per halo (the reference's len(halos[i]))."""
        return self._counts

    # -- vectorized per-halo statistics (no Python loop over halos) ---------
    def stat(self, field: str, stat: str = "sum",
             weight: Optional[str] = None) -> QArray:
        """One segment reduction giving ``stat`` of ``field`` for EVERY halo.

        >>> cat.stat("mass", "sum")     # total mass of each halo at once
        """
        q = self.snap[field]
        w = None if weight is None else self.snap[weight].value
        valid = self._grp != self.unassigned
        safe = jnp.where(valid, self._grp, 0)
        out = ops.segment_stat(q.value, safe, max(self._n_halos, 1),
                               stat=stat, weights=w, mask=valid)
        return QArray(out, q.units)

    def centers(self, weight: str = "mass") -> QArray:
        """Mass-weighted center of every halo in one pass."""
        pos = self.snap["pos"]
        w = self.snap[weight].value
        valid = self._grp != self.unassigned
        safe = jnp.where(valid, self._grp, 0)
        num = ops.segment_stat(pos.value, safe, max(self._n_halos, 1),
                               stat="sum_w", weights=w, mask=valid)
        den = ops.segment_sum(jnp.where(valid, w, 0.0), safe,
                              max(self._n_halos, 1))
        return QArray(num / jnp.maximum(den, 1e-30)[:, None], pos.units)

    def __repr__(self):
        return (f"<HaloCatalog n_halos={self._n_halos} "
                f"grouped={int(self._counts.sum())}/{self.snap.n_total}>")
