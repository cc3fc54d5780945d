"""Gravitational softening kernels as branch-free jnp expressions.

Reference counterpart: ``crates/gravity/src/kernel.rs`` — Plummer and the
Springel (2005) cubic-spline W2 kernel (eq. 71), potential per unit mass
φ(r;h) and acceleration factor g(r;h) with a = m·r⃗·g.  The Rust per-scalar
``if`` ladders become vectorized ``jnp.where`` selects so the same code runs
inside Pallas tiles and plain XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["KERNEL_NONE", "KERNEL_PLUMMER", "KERNEL_SPLINE",
           "kernel_potential_per_unit_mass", "kernel_accel_factor",
           "w2", "w2_prime", "multipole_min_separation_factor"]

# kernel codes (match the reference binding: 0=Plummer 1=CubicSplineW2,
# plus None; we use explicit names and map in the API layer)
KERNEL_NONE = "none"
KERNEL_PLUMMER = "plummer"
KERNEL_SPLINE = "spline"

_TINY = 1e-30


def w2(u):
    """Springel W2(u): piecewise quintic, −1/u beyond u≥1
    (reference ``kernel.rs:85-110``)."""
    u = jnp.asarray(u)
    u_safe = jnp.maximum(u, 1e-12)
    u2 = u * u
    u4 = u2 * u2
    u5 = u4 * u
    inner = (16.0 / 3.0) * u2 - (48.0 / 5.0) * u4 + (32.0 / 5.0) * u5 - 14.0 / 5.0
    u3 = u2 * u
    outer = ((1.0 / 15.0) / u_safe + (32.0 / 3.0) * u2 - 16.0 * u3
             + (48.0 / 5.0) * u4 - (32.0 / 15.0) * u5 - 16.0 / 5.0)
    far = -1.0 / u_safe
    return jnp.where(u < 0.5, inner, jnp.where(u < 1.0, outer, far))


def w2_prime(u):
    """dW2/du (reference ``kernel.rs:112-128``)."""
    u = jnp.asarray(u)
    u_safe = jnp.maximum(u, 1e-12)
    u2 = u * u
    u3 = u2 * u
    u4 = u2 * u2
    inner = (32.0 / 3.0) * u - (192.0 / 5.0) * u3 + 32.0 * u4
    outer = (-(1.0 / 15.0) / (u_safe * u_safe) + (64.0 / 3.0) * u
             - 48.0 * u2 + (192.0 / 5.0) * u3 - (32.0 / 3.0) * u4)
    far = 1.0 / (u_safe * u_safe)
    return jnp.where(u < 0.5, inner, jnp.where(u < 1.0, outer, far))


def kernel_potential_per_unit_mass(kind: str, r, h):
    """φ per unit mass; 0 at r == 0 (reference ``kernel.rs:41-60``)."""
    r = jnp.asarray(r)
    r_safe = jnp.maximum(r, _TINY)
    if kind == KERNEL_NONE:
        phi = -1.0 / r_safe
    elif kind == KERNEL_PLUMMER:
        phi = -1.0 / jnp.sqrt(r * r + h * h + _TINY)
    elif kind == KERNEL_SPLINE:
        h_safe = jnp.maximum(h, _TINY)
        u = r / h_safe
        phi = jnp.where(h > 0, w2(u) / h_safe, -1.0 / r_safe)
    else:
        raise ValueError(f"unknown kernel {kind!r}")
    return jnp.where(r == 0.0, 0.0, phi)


def kernel_accel_factor(kind: str, r, h):
    """g(r;h) with a⃗ = m·r⃗·g, r⃗ = source − target; 0 at r == 0
    (reference ``kernel.rs:62-83``)."""
    r = jnp.asarray(r)
    r_safe = jnp.maximum(r, _TINY)
    if kind == KERNEL_NONE:
        g = 1.0 / (r_safe * r_safe * r_safe)
    elif kind == KERNEL_PLUMMER:
        s2 = r * r + h * h + _TINY
        g = 1.0 / (jnp.sqrt(s2) * s2)
    elif kind == KERNEL_SPLINE:
        h_safe = jnp.maximum(h, _TINY)
        u = r / h_safe
        g = jnp.where(h > 0,
                      w2_prime(u) / (h_safe * h_safe * r_safe),
                      1.0 / (r_safe * r_safe * r_safe))
    else:
        raise ValueError(f"unknown kernel {kind!r}")
    return jnp.where(r == 0.0, 0.0, g)


def multipole_min_separation_factor(kind: str) -> float:
    """Softening admissibility factor c: node approximation allowed only for
    r > c·h (reference ``kernel.rs:20-37``)."""
    return {KERNEL_NONE: 0.0, KERNEL_PLUMMER: 2.8, KERNEL_SPLINE: 1.0}[kind]
