"""Generic halo/galaxy property calculators.

Reference counterpart: ``pynbodyext/properties/generic.py``.  Every numpy /
pynbody.analysis call becomes a masked jnp reduction or a bounded
``lax.while_loop`` from :mod:`..ops`:

* ``CenPos`` modes: ``ssc`` (shrinking sphere, natively implemented),
  ``com`` (mass-weighted mean), ``pot`` (argmin φ), ``hyb`` (potential seed
  + ssc within 5 kpc) — reference ``generic.py:38-62``;
* ``KappaRot`` per Sales et al. 2010 eq. (1); ``SpinParam`` per Bullock
  et al. 2001 eq. (5); ``PatternSpeed`` per Pfenniger & Romero-Gómez 2023
  eq. (46).
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from .. import ops
from ..core.calculate import Param, ParamView, PropertyBase
from ..quantity import QArray, strip_units
from ..units import G as G_UNIT
from ..units import parse_unit

__all__ = ["CenPos", "CenVel", "AngMomVec", "KappaRot", "KappaRotMean",
           "VirialRadius", "SpinParam", "PatternSpeed"]

_CEN_MODES = ("ssc", "com", "pot", "hyb")


def _mass_weights(sim):
    return sim["mass"].value


@PropertyBase.dataclass
class CenPos(PropertyBase):
    """Center position (reference ``generic.py:38-62``)."""

    mode: str = "ssc"

    def __post_init__(self):
        if self.mode not in _CEN_MODES:
            raise ValueError(f"Invalid mode: {self.mode}. Expected one of "
                             f"{list(_CEN_MODES)}.")

    def calculate(self, sim, params: ParamView):
        pos = sim["pos"]
        from ..chunk.stream import (is_streaming_array, stream_weighted_mean)
        if is_streaming_array(pos):
            if params.mode == "com":
                # true streaming reduction: one chunk resident at a time
                return QArray(stream_weighted_mean(pos, sim["mass"]),
                              pos.units)
            # sort/iteration-shaped centers: stream-concatenate only the
            # selected pos (and phi) columns — ≪ the full snapshot
            pv = pos.compute().value
            w = sim["mass"].compute().value
            if params.mode == "pot":
                cen = ops.potential_center(pv, sim["phi"].compute().value)
            elif params.mode == "ssc":
                cen = ops.shrink_sphere_center(pv, weights=w)
            else:  # hyb
                r5 = parse_unit("5 kpc").ratio(pos.units,
                                               **sim.chunk_view(0)
                                               .units_context())
                cen = ops.hybrid_center(pv, sim["phi"].compute().value,
                                        weights=w, r=float(r5))
            return QArray(cen, pos.units)
        w = _mass_weights(sim)
        if params.mode == "com":
            cen = ops.center_of_mass(pos.value, w, mask=sim.mask)
        elif params.mode == "pot":
            cen = ops.potential_center(pos.value, sim["phi"].value,
                                       mask=sim.mask)
        elif params.mode == "ssc":
            cen = ops.shrink_sphere_center(pos.value, weights=w,
                                           mask=sim.mask)
        elif params.mode == "hyb":
            r5 = parse_unit("5 kpc").ratio(pos.units, **sim.units_context())
            cen = ops.hybrid_center(pos.value, sim["phi"].value, weights=w,
                                    mask=sim.mask, r=float(r5))
        else:  # pragma: no cover
            raise ValueError(params.mode)
        return QArray(cen, pos.units)


@PropertyBase.dataclass
class CenVel(PropertyBase):
    """Center-of-mass velocity (reference ``generic.py:64``)."""

    mode: str = "com"

    def __post_init__(self):
        if self.mode != "com":
            raise ValueError(f"Invalid mode: {self.mode}. Expected 'com'.")

    def calculate(self, sim, params: ParamView):
        vel = sim["vel"]
        from ..chunk.stream import (is_streaming_array, stream_weighted_mean)
        if is_streaming_array(vel):
            return QArray(stream_weighted_mean(vel, sim["mass"]), vel.units)
        cen = ops.center_of_mass(vel.value, _mass_weights(sim), mask=sim.mask)
        return QArray(cen, vel.units)


@PropertyBase.dataclass
class AngMomVec(PropertyBase):
    """Total angular momentum Σ m·(r×v) (reference ``generic.py:84-97``)."""

    def calculate(self, sim, params: ParamView):
        pos, vel, mass = sim["pos"], sim["vel"], sim["mass"]
        from ..chunk.stream import (is_streaming_array,
                                    stream_weighted_cross_sum)
        if is_streaming_array(pos):
            return QArray(stream_weighted_cross_sum(pos, vel, mass),
                          mass.units * pos.units * vel.units)
        cross = jnp.cross(pos.value, vel.value)
        am = ops.msum(cross, sim.mask, weights=mass.value)
        return QArray(am, mass.units * pos.units * vel.units)


@PropertyBase.dataclass
class KappaRot(PropertyBase):
    """Fraction of kinetic energy in ordered rotation, Sales+2010 eq. (1):
    κ_rot = Σ ½ m (j_z/R)² / Σ m·ke (reference ``generic.py:99-116``)."""

    def calculate(self, sim, params: ParamView):
        m = sim["mass"].value
        vcxy = sim["vcxy"].value
        ke = sim["ke"].value
        krot = ops.msum(0.5 * m * vcxy * vcxy, sim.mask)
        k = ops.msum(m * ke, sim.mask)
        return krot / k


@PropertyBase.dataclass
class KappaRotMean(PropertyBase):
    """Mean per-particle ratio (½ vcxy²) / ke (reference ``generic.py:118``)."""

    def calculate(self, sim, params: ParamView):
        vcxy = sim["vcxy"].value
        ke = sim["ke"].value
        ratio = 0.5 * vcxy * vcxy / jnp.maximum(ke, 1e-30)
        return ops.mmean(ratio, sim.mask)


@PropertyBase.dataclass
class VirialRadius(PropertyBase):
    """Radius where mean enclosed density = overdensity × ρ_ref
    (reference ``generic.py:133``, pynbody ``virial_radius``).

    ρ_ref: 'critical' → 3H²/8πG with H = 100·h·E(z) km/s/Mpc;
    'matter' → Ω_m ρ_crit (1+z)³.  Cosmology read from snapshot
    properties (h, a, omegaM — defaults 0.7, 1.0, 0.3).
    """

    overdensity: float = 178.0
    rho_def: str = "critical"

    def __post_init__(self):
        if self.rho_def not in ("critical", "matter"):
            raise ValueError(f"Invalid rho_def: {self.rho_def}. Expected one "
                             "of ['critical', 'matter'].")

    def calculate(self, sim, params: ParamView):
        r = sim["r"]
        m = sim["mass"]
        props = sim.properties
        h = float(strip_units(props.get("h", 0.7)))
        a = float(strip_units(props.get("a", 1.0)))
        om = float(strip_units(props.get("omegaM", 0.3)))
        ol = float(strip_units(props.get("omegaL", 1.0 - om)))
        z = 1.0 / a - 1.0
        # H(z) in km/s/Mpc
        Hz = 100.0 * h * np.sqrt(om * (1 + z) ** 3 + ol)
        H_unit = parse_unit("km s**-1") / parse_unit("Mpc")
        rho_unit = m.units / r.units ** 3
        # ρ_crit = 3 H² / (8 π G), converted into (mass/pos³) units
        rho_crit = (3.0 * Hz ** 2 * (H_unit ** 2) /
                    (8.0 * np.pi * G_UNIT))
        rho_c_val = rho_crit.ratio(rho_unit)
        if params.rho_def == "matter":
            rho_c_val *= om * (1 + z) ** 3
        target = params.overdensity * rho_c_val
        rv = ops.virial_radius(r.value, m.value, jnp.asarray(target,
                                                             dtype=r.value.dtype),
                               mask=sim.mask)
        return QArray(rv, r.units)


@PropertyBase.dataclass
class SpinParam(PropertyBase):
    """Bullock et al. 2001 eq. (5): λ' = j / (√2 R V_c(R)), with j the
    specific angular momentum inside R, R the outermost particle radius and
    V_c = √(G M / R).  Assumes the halo is centered (reference
    ``generic.py:146`` via pynbody ``spin_parameter``)."""

    def calculate(self, sim, params: ParamView):
        pos, vel, mass = sim["pos"], sim["vel"], sim["mass"]
        m = mass.value
        cross = jnp.cross(pos.value, vel.value)
        J = ops.msum(cross, sim.mask, weights=m)
        M = ops.msum(m, sim.mask)
        R = ops.mmax(sim["r"].value, sim.mask)
        j_spec = jnp.linalg.norm(J) / M
        # G in (pos·vel²/mass) units so that G M / R is vel²
        g_val = G_UNIT.ratio(pos.units * (vel.units ** 2) / mass.units)
        Vc = jnp.sqrt(g_val * M / R)
        lam = j_spec / (jnp.sqrt(2.0) * R * Vc)
        return lam


@PropertyBase.dataclass
class PatternSpeed(PropertyBase):
    """Pattern speed Ω_z from the moment-of-inertia method, Pfenniger &
    Romero-Gómez 2023 eq. (46) (reference ``generic.py:173-198``)."""

    def calculate(self, sim, params: ParamView):
        m = sim["mass"].value
        p = sim["pos"].value
        v = sim["vel"].value
        x, y = p[..., 0], p[..., 1]
        vx, vy = v[..., 0], v[..., 1]
        mk = sim.mask
        Ixx = ops.msum(m * x * x, mk)
        Iyy = ops.msum(m * y * y, mk)
        Ixy = ops.msum(m * x * y, mk)
        I_minus = 0.5 * (Ixx - Iyy)
        d_Ixy = ops.msum(m * (x * vy + y * vx), mk)
        d_I_minus = ops.msum(m * (x * vx - y * vy), mk)
        omega = 0.5 * (I_minus * d_Ixy - d_I_minus * Ixy) \
            / (I_minus * I_minus + Ixy * Ixy)
        return QArray(omega, sim["vel"].units / sim["pos"].units)
