"""Multi-snapshot batch execution.

The reference's multi-snapshot story is "dask chunks + a Python loop"
(SURVEY.md §2.4/§7); on TPU the natural forms are

* :func:`batched_kappa_pipeline` — stack snapshots on a leading axis and
  ``vmap`` the fused pipeline: one compilation, all snapshots in flight
  (time-series analysis of equal-N snapshot sequences);
* :func:`map_snapshots` — a compiled-once Python loop for ragged snapshot
  sequences (each distinct N compiles once, then reuses).
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Sequence

import jax
import jax.numpy as jnp

from .compiled import kappa_rot_pipeline
from .snap.snapshot import Snapshot

__all__ = ["batched_kappa_pipeline", "stack_snapshots", "map_snapshots"]


def stack_snapshots(snaps: Sequence[Snapshot], fields=("pos", "vel", "mass")):
    """Stack equal-N snapshots on a leading batch axis (device arrays)."""
    n = snaps[0].n_total
    for s in snaps:
        if s.n_total != n:
            raise ValueError("stack_snapshots requires equal particle "
                             "counts; use map_snapshots for ragged sets")
    out = {f: jnp.stack([s[f].value for s in snaps]) for f in fields}
    out["star_mask"] = jnp.stack([s.family_mask("star") for s in snaps])
    return out


_batched_kappa = jax.jit(jax.vmap(
    lambda pos, vel, mass, star, box: kappa_rot_pipeline(
        pos, vel, mass, star, box),
    in_axes=(0, 0, 0, 0, 0)))


def batched_kappa_pipeline(snaps: Sequence[Snapshot],
                           boxsize: float = 0.0,
                           radius: float = 30.0):
    """κ_rot of every snapshot in one vmapped XLA program."""
    stacked = stack_snapshots(snaps)
    b = jnp.full((len(snaps),), jnp.float32(boxsize))
    return _batched_kappa(stacked["pos"], stacked["vel"], stacked["mass"],
                          stacked["star_mask"], b)


def map_snapshots(fn: Callable, snaps: Iterable[Snapshot]) -> List:
    """Apply a (jitted) snapshot function over a sequence; compilation is
    cached per distinct shape signature."""
    return [fn(s) for s in snaps]
