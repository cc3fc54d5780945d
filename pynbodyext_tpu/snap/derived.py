"""Built-in derived fields (pynbody derived-array equivalents).

The reference relies on pynbody's derived arrays (``r``, ``rxy``, ``vr``,
``ke``, ``vcxy``, ``age`` …) for its calculators and profiles (e.g. KappaRot
at ``properties/generic.py:99-116`` uses ``vcxy``/``ke``; StarAgeProfile at
``profiles/time_profile.py:16`` uses ``age``).  Here they are plain jnp
expressions over the flattened SoA; XLA fuses them into consumers.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..quantity import QArray
from .snapshot import derived_field

_EPS = 1e-30


@derived_field("r")
def _r(snap) -> QArray:
    """Spherical radius |pos|."""
    pos = snap["pos"]
    return QArray(jnp.linalg.norm(pos.value, axis=-1), pos.units)


@derived_field("rxy")
def _rxy(snap) -> QArray:
    """Cylindrical radius in the xy plane."""
    pos = snap["pos"]
    return QArray(jnp.linalg.norm(pos.value[..., :2], axis=-1), pos.units)


@derived_field("r2")
def _r2(snap) -> QArray:
    pos = snap["pos"]
    return QArray(jnp.sum(pos.value * pos.value, axis=-1), pos.units ** 2)


@derived_field("vr")
def _vr(snap) -> QArray:
    """Radial velocity (pos·vel)/|pos|."""
    pos, vel = snap["pos"], snap["vel"]
    r = jnp.linalg.norm(pos.value, axis=-1)
    return QArray(jnp.sum(pos.value * vel.value, axis=-1) / jnp.maximum(r, _EPS),
                  vel.units)


@derived_field("vrxy")
def _vrxy(snap) -> QArray:
    """Cylindrical-radial velocity (x·vx + y·vy)/rxy."""
    pos, vel = snap["pos"], snap["vel"]
    rxy = jnp.linalg.norm(pos.value[..., :2], axis=-1)
    num = jnp.sum(pos.value[..., :2] * vel.value[..., :2], axis=-1)
    return QArray(num / jnp.maximum(rxy, _EPS), vel.units)


@derived_field("v2")
def _v2(snap) -> QArray:
    vel = snap["vel"]
    return QArray(jnp.sum(vel.value * vel.value, axis=-1), vel.units ** 2)


@derived_field("ke")
def _ke(snap) -> QArray:
    """Specific kinetic energy ½|v|²."""
    vel = snap["vel"]
    return QArray(0.5 * jnp.sum(vel.value * vel.value, axis=-1), vel.units ** 2)


@derived_field("j")
def _j(snap) -> QArray:
    """Specific angular momentum pos × vel, shape (N, 3)."""
    pos, vel = snap["pos"], snap["vel"]
    return QArray(jnp.cross(pos.value, vel.value), pos.units * vel.units)


@derived_field("jz")
def _jz(snap) -> QArray:
    pos, vel = snap["pos"], snap["vel"]
    p, v = pos.value, vel.value
    return QArray(p[..., 0] * v[..., 1] - p[..., 1] * v[..., 0],
                  pos.units * vel.units)


@derived_field("vcxy")
def _vcxy(snap) -> QArray:
    """Circular-equivalent velocity in the plane: j_z / r_xy (Sales+2010)."""
    pos, vel = snap["pos"], snap["vel"]
    p, v = pos.value, vel.value
    jz = p[..., 0] * v[..., 1] - p[..., 1] * v[..., 0]
    rxy = jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2)
    return QArray(jz / jnp.maximum(rxy, _EPS), vel.units)


@derived_field("vphi")
def _vphi(snap) -> QArray:
    return _vcxy(snap)


@derived_field("vt")
def _vt(snap) -> QArray:
    """Tangential speed sqrt(v² − vr²)."""
    pos, vel = snap["pos"], snap["vel"]
    r = jnp.linalg.norm(pos.value, axis=-1)
    vr = jnp.sum(pos.value * vel.value, axis=-1) / jnp.maximum(r, _EPS)
    v2 = jnp.sum(vel.value * vel.value, axis=-1)
    return QArray(jnp.sqrt(jnp.maximum(v2 - vr * vr, 0.0)), vel.units)


@derived_field("vtheta")
def _vtheta(snap) -> QArray:
    """Polar velocity component v·θ̂ (spherical coordinates)."""
    pos, vel = snap["pos"], snap["vel"]
    p, v = pos.value, vel.value
    rxy = jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2)
    r = jnp.linalg.norm(p, axis=-1)
    num = (p[..., 2] * (p[..., 0] * v[..., 0] + p[..., 1] * v[..., 1])
           / jnp.maximum(rxy, _EPS) - rxy * v[..., 2])
    return QArray(num / jnp.maximum(r, _EPS), vel.units)


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
