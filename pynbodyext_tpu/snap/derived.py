"""Built-in derived fields (pynbody derived-array equivalents).

The reference relies on pynbody's derived arrays (``r``, ``rxy``, ``vr``,
``ke``, ``vcxy``, ``age`` …) for its calculators and profiles (e.g. KappaRot
at ``properties/generic.py:99-116`` uses ``vcxy``/``ke``; StarAgeProfile at
``profiles/time_profile.py:16`` uses ``age``).  Here each field is a single
``jax.jit`` kernel over the flattened SoA: one relay dispatch per field
(eager op chains cost ~2 ms/op through the TPU tunnel), and XLA still fuses
the jitted call into consumers where possible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quantity import QArray
from .snapshot import derived_field

_EPS = 1e-30


@jax.jit
def _norm3(p):
    return jnp.linalg.norm(p, axis=-1)


@jax.jit
def _norm2(p):
    return jnp.linalg.norm(p[..., :2], axis=-1)


@jax.jit
def _sumsq(p):
    return jnp.sum(p * p, axis=-1)


@derived_field("r")
def _r(snap) -> QArray:
    """Spherical radius |pos|."""
    pos = snap["pos"]
    return QArray(_norm3(pos.value), pos.units)


@derived_field("rxy")
def _rxy(snap) -> QArray:
    """Cylindrical radius in the xy plane."""
    pos = snap["pos"]
    return QArray(_norm2(pos.value), pos.units)


@derived_field("r2")
def _r2(snap) -> QArray:
    pos = snap["pos"]
    return QArray(_sumsq(pos.value), pos.units ** 2)


@jax.jit
def _vr_core(p, v):
    r = jnp.linalg.norm(p, axis=-1)
    return jnp.sum(p * v, axis=-1) / jnp.maximum(r, _EPS)


@derived_field("vr")
def _vr(snap) -> QArray:
    """Radial velocity (pos·vel)/|pos|."""
    pos, vel = snap["pos"], snap["vel"]
    return QArray(_vr_core(pos.value, vel.value), vel.units)


@jax.jit
def _vrxy_core(p, v):
    rxy = jnp.linalg.norm(p[..., :2], axis=-1)
    num = jnp.sum(p[..., :2] * v[..., :2], axis=-1)
    return num / jnp.maximum(rxy, _EPS)


@derived_field("vrxy")
def _vrxy(snap) -> QArray:
    """Cylindrical-radial velocity (x·vx + y·vy)/rxy."""
    pos, vel = snap["pos"], snap["vel"]
    return QArray(_vrxy_core(pos.value, vel.value), vel.units)


@derived_field("v2")
def _v2(snap) -> QArray:
    vel = snap["vel"]
    return QArray(_sumsq(vel.value), vel.units ** 2)


@jax.jit
def _ke_core(v):
    return 0.5 * jnp.sum(v * v, axis=-1)


@derived_field("ke")
def _ke(snap) -> QArray:
    """Specific kinetic energy ½|v|²."""
    vel = snap["vel"]
    return QArray(_ke_core(vel.value), vel.units ** 2)


@jax.jit
def _cross_core(p, v):
    return jnp.cross(p, v)


@derived_field("j")
def _j(snap) -> QArray:
    """Specific angular momentum pos × vel, shape (N, 3)."""
    pos, vel = snap["pos"], snap["vel"]
    return QArray(_cross_core(pos.value, vel.value), pos.units * vel.units)


@jax.jit
def _jz_core(p, v):
    return p[..., 0] * v[..., 1] - p[..., 1] * v[..., 0]


@derived_field("jz")
def _jz(snap) -> QArray:
    pos, vel = snap["pos"], snap["vel"]
    return QArray(_jz_core(pos.value, vel.value), pos.units * vel.units)


@jax.jit
def _vcxy_core(p, v):
    jz = p[..., 0] * v[..., 1] - p[..., 1] * v[..., 0]
    rxy = jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2)
    return jz / jnp.maximum(rxy, _EPS)


@derived_field("vcxy")
def _vcxy(snap) -> QArray:
    """Circular-equivalent velocity in the plane: j_z / r_xy (Sales+2010)."""
    pos, vel = snap["pos"], snap["vel"]
    return QArray(_vcxy_core(pos.value, vel.value), vel.units)


@derived_field("vphi")
def _vphi(snap) -> QArray:
    return _vcxy(snap)


@jax.jit
def _vt_core(p, v):
    r = jnp.linalg.norm(p, axis=-1)
    vr = jnp.sum(p * v, axis=-1) / jnp.maximum(r, _EPS)
    v2 = jnp.sum(v * v, axis=-1)
    return jnp.sqrt(jnp.maximum(v2 - vr * vr, 0.0))


@derived_field("vt")
def _vt(snap) -> QArray:
    """Tangential speed sqrt(v² − vr²)."""
    pos, vel = snap["pos"], snap["vel"]
    return QArray(_vt_core(pos.value, vel.value), vel.units)


@jax.jit
def _vtheta_core(p, v):
    rxy = jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2)
    r = jnp.linalg.norm(p, axis=-1)
    num = (p[..., 2] * (p[..., 0] * v[..., 0] + p[..., 1] * v[..., 1])
           / jnp.maximum(rxy, _EPS) - rxy * v[..., 2])
    return num / jnp.maximum(r, _EPS)


@derived_field("vtheta")
def _vtheta(snap) -> QArray:
    """Polar velocity component v·θ̂ (spherical coordinates)."""
    pos, vel = snap["pos"], snap["vel"]
    return QArray(_vtheta_core(pos.value, vel.value), vel.units)


@derived_field("age")
def _age(snap) -> QArray:
    """Stellar age = snapshot time − formation time (valid on star family)."""
    tform = snap["tform"]
    time = snap.properties.get("time")
    if time is None:
        raise KeyError("snapshot has no 'time' property; cannot derive 'age'")
    tq = time if isinstance(time, QArray) else QArray(time, tform.units)
    return QArray(tq.to_value(tform.units) - tform.value, tform.units)


@derived_field("rho_inv")
def _rho_inv(snap) -> QArray:
    rho = snap["rho"]
    return QArray(1.0 / jnp.maximum(rho.value, _EPS), rho.units ** -1)
