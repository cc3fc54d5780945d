"""Fused, fully-jitted benchmark pipelines.

The calculator engine (:mod:`.core.calculate`) drives jnp ops from the host
— flexible, introspectable, cached, but each phase is its own dispatch.  For
production hot paths the whole pipeline should be ONE XLA program: every
transform fuses into the reductions, nothing round-trips to the host
(BASELINE.json north star: full KappaRot pipeline < 100 ms at 10M
particles).  This module provides those fused equivalents; they are
cross-validated against the engine path in the test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import ops

__all__ = ["kappa_rot_pipeline", "kappa_rot_pipeline_from_snapshot"]


@functools.partial(jax.jit, static_argnames=("min_particles", "ssc_stride"))
def kappa_rot_pipeline(pos, vel, mass, star_mask, boxsize,
                       radius=30.0, min_particles: int = 100,
                       ssc_stride: int = 64):
    """WrapBox(minirange) → ShiftPosTo('ssc') → ShiftVelTo('com') →
    AlignVec(AngMomVec) → KappaRot, measured on stars within ``radius``
    (BASELINE.json config 4) — one XLA program.

    Parameters are raw device arrays: ``pos``/``vel`` (N,3) f32, ``mass``
    (N,), ``star_mask`` (N,) bool, ``boxsize`` scalar (0 disables wrapping).
    ``ssc_stride`` controls the coarse-to-fine shrinking-sphere ladder
    (default 64; validated against the exact loop to the f32 noise floor —
    see ``ops.shrink_sphere_center``; pass 1 for the exact loop).

    Returns the scalar κ_rot.
    """
    dtype = pos.dtype
    L = jnp.asarray(boxsize, dtype)

    # -- WrapBox, minirange convention -----------------------------------
    def wrap(p):
        wc = p - jnp.floor((p + 0.5 * L) / L) * L
        wu = p - jnp.floor(p / L) * L
        range_c = jnp.max(wc, axis=0) - jnp.min(wc, axis=0)
        range_u = jnp.max(wu, axis=0) - jnp.min(wu, axis=0)
        return jnp.where(range_c <= range_u, wc, wu)

    pos = jax.lax.cond(L > 0, wrap, lambda p: p, pos)

    # -- ShiftPosTo("ssc") --------------------------------------------------
    cen = ops.shrink_sphere_center(pos, weights=mass,
                                   min_particles=min_particles,
                                   coarse_stride=ssc_stride)
    pos = pos - cen

    # -- measurement selection: stars within `radius` of the new center ----
    r2 = jnp.sum(pos * pos, axis=-1)
    sel = jnp.logical_and(star_mask, r2 < radius * radius)
    w = jnp.where(sel, mass, 0.0)
    wsum = jnp.maximum(jnp.sum(w), 1e-30)

    # -- ShiftVelTo("com").measure_with(sel) ---------------------------------
    vcen = jnp.sum(vel * w[:, None], axis=0) / wsum
    vel = vel - vcen

    # -- AlignVec(AngMomVec()).measure_with(sel) ------------------------------
    am = jnp.sum(jnp.cross(pos, vel) * w[:, None], axis=0)
    R = ops.faceon_matrix(am).astype(dtype)
    pos = pos @ R.T
    vel = vel @ R.T

    # -- KappaRot over sel (Sales+2010 eq. 1) ----------------------------------
    jz = pos[:, 0] * vel[:, 1] - pos[:, 1] * vel[:, 0]
    rxy2 = pos[:, 0] ** 2 + pos[:, 1] ** 2
    vcxy2 = jz * jz / jnp.maximum(rxy2, 1e-30)
    ke2 = jnp.sum(vel * vel, axis=-1)  # 2·ke
    krot = jnp.sum(jnp.where(sel, 0.5 * mass * vcxy2, 0.0))
    k = jnp.sum(jnp.where(sel, 0.5 * mass * ke2, 0.0))
    return krot / k


def kappa_rot_pipeline_from_snapshot(snap, radius: float = 30.0):
    """Convenience wrapper feeding a :class:`~.snap.Snapshot`."""
    box = snap.properties.get("boxsize")
    from .quantity import strip_units
    L = 0.0 if box is None else float(
        box.to_value(snap["pos"].units, **snap.units_context())
        if hasattr(box, "to_value") else strip_units(box))
    return kappa_rot_pipeline(snap["pos"].value, snap["vel"].value,
                              snap["mass"].value,
                              snap.family_mask("star"),
                              jnp.float32(L), radius=radius)
