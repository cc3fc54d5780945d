"""Multi-snapshot batch execution.

The reference's multi-snapshot story is "dask chunks + a Python loop"
(SURVEY.md §2.4/§7); on TPU the natural forms are

* :func:`batched_pipeline` — stack snapshots on a leading axis and
  ``vmap`` ANY per-snapshot array function: one compilation, all
  snapshots in flight (time-series analysis of equal-N sequences);
* :func:`batched_kappa_pipeline` — the flagship instance (fused κ_rot);
* :func:`map_snapshots` — a compiled-once Python loop for ragged snapshot
  sequences (each distinct N compiles once, then reuses).
"""

from __future__ import annotations

import functools
from typing import Callable, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp

from .compiled import kappa_rot_pipeline
from .quantity import strip_units
from .snap.snapshot import Snapshot

__all__ = ["batched_kappa_pipeline", "batched_pipeline", "stack_snapshots",
           "map_snapshots"]


def stack_snapshots(snaps: Sequence[Snapshot],
                    fields: Sequence[str] = ("pos", "vel", "mass"),
                    families: Sequence[str] = ("star",)):
    """Stack equal-N snapshots on a leading batch axis (device arrays).

    ``fields`` may name stored or derived fields; ``families`` adds a
    ``<fam>_mask`` boolean entry per requested family.  Softening stacks
    like any other field when present (pass it in ``fields``)."""
    n = snaps[0].n_total
    for s in snaps:
        if s.n_total != n:
            raise ValueError("stack_snapshots requires equal particle "
                             "counts; use map_snapshots for ragged sets")
    out = {f: jnp.stack([s[f].value for s in snaps]) for f in fields}
    for fam in families:
        out[f"{fam}_mask"] = jnp.stack([s.family_mask(fam) for s in snaps])
    return out


def _boxsizes(snaps: Sequence[Snapshot],
              boxsize: Optional[float]) -> jnp.ndarray:
    """Per-snapshot boxsize vector: explicit scalar, or read from each
    snapshot's properties (0 = no wrapping)."""
    if boxsize is not None:
        return jnp.full((len(snaps),), jnp.float32(boxsize))
    vals = []
    for s in snaps:
        box = s.properties.get("boxsize")
        if box is None:
            vals.append(0.0)
        elif hasattr(box, "to_value"):
            vals.append(float(box.to_value(s["pos"].units,
                                           **s.units_context())))
        else:
            vals.append(float(strip_units(box)))
    return jnp.asarray(vals, jnp.float32)


def batched_pipeline(fn: Callable, snaps: Sequence[Snapshot],
                     fields: Sequence[str] = ("pos", "vel", "mass"),
                     families: Sequence[str] = ("star",), **stack_kw):
    """vmap ``fn(**arrays)`` over a stack of equal-N snapshots.

    ``fn`` receives one keyword argument per entry of
    :func:`stack_snapshots` (fields by name, ``<fam>_mask`` per family),
    each WITHOUT the batch axis; the call compiles once and evaluates
    every snapshot in one XLA program."""
    stacked = stack_snapshots(snaps, fields=fields, families=families,
                              **stack_kw)
    keys = sorted(stacked)
    batched = jax.jit(jax.vmap(lambda *a: fn(**dict(zip(keys, a)))))
    return batched(*(stacked[k] for k in keys))


@functools.lru_cache(maxsize=None)
def _batched_kappa(radius: float):
    return jax.jit(jax.vmap(
        lambda pos, vel, mass, star, box: kappa_rot_pipeline(
            pos, vel, mass, star, box, radius=radius),
        in_axes=(0, 0, 0, 0, 0)))


def batched_kappa_pipeline(snaps: Sequence[Snapshot],
                           boxsize: Optional[float] = None,
                           radius: float = 30.0):
    """κ_rot of every snapshot in one vmapped XLA program.

    ``boxsize=None`` reads each snapshot's own ``boxsize`` property
    (0 disables wrapping); ``radius`` is the stellar measurement sphere.
    """
    stacked = stack_snapshots(snaps)
    b = _boxsizes(snaps, boxsize)
    return _batched_kappa(float(radius))(
        stacked["pos"], stacked["vel"], stacked["mass"],
        stacked["star_mask"], b)


def map_snapshots(fn: Callable, snaps: Iterable[Snapshot]) -> List:
    """Apply a (jitted) snapshot function over a sequence; compilation is
    cached per distinct shape signature."""
    return [fn(s) for s in snaps]
