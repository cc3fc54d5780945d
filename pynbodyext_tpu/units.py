"""Standalone unit system for the TPU-native particle-analysis engine.

The reference library (`wx-ys/pynbody-extras`) leans on ``pynbody.units``
everywhere (see reference ``pynbodyext/core/calculate/params.py:280-312``,
``gravity/pyn_gravity.py:14``).  pynbody is not a dependency here, so we keep a
minimal but correct dimensional-analysis module of our own.  Design rules:

* Units live strictly OUTSIDE traced/jitted code.  A :class:`Unit` is a pure
  host object: a scale factor plus integer-rational exponents over the base
  dimensions (length, mass, time, temperature) and the cosmological symbols
  ``a`` (scale factor) and ``h`` (dimensionless Hubble parameter).
* Conversion is a single host-side float (``Unit.ratio``) that is multiplied
  into device arrays lazily — never per-element unit objects.

Supported syntax mirrors the pynbody string format used throughout the
reference: ``"km s**-1"``, ``"Msol kpc**-3"``, ``"2.3e4 kpc"``, ``"a kpc h**-1"``.
"""

from __future__ import annotations

import math
import re
from fractions import Fraction
from typing import Union

__all__ = [
    "Unit",
    "UnitError",
    "units",
    "parse_unit",
    "G",
    "NoUnit",
    "dimensionless",
]


class UnitError(ValueError):
    """Raised on malformed unit strings or incompatible conversions."""


# Base dimensions: length, mass, time, temperature, scale factor a, hubble h.
_DIMS = ("L", "M", "T", "K", "a", "h")


def _dimvec(**kw: Union[int, Fraction]) -> tuple:
    return tuple(Fraction(kw.get(d, 0)) for d in _DIMS)


class Unit:
    """An immutable physical unit: ``scale * L^l M^m T^t K^k a^x h^y``.

    ``scale`` is relative to the SI-ish base (m, kg, s, K).  ``a``/``h``
    exponents stay symbolic until resolved with a cosmological context via
    :meth:`ratio`.
    """

    __slots__ = ("scale", "dims")

    def __init__(self, scale: float, dims: tuple):
        object.__setattr__(self, "scale", float(scale))
        object.__setattr__(self, "dims", tuple(Fraction(d) for d in dims))

    def __setattr__(self, *_):  # pragma: no cover - immutability guard
        raise AttributeError("Unit is immutable")

    def __reduce__(self):  # picklable despite the immutability guard
        return (Unit, (self.scale, self.dims))

    # -- algebra ----------------------------------------------------------
    def __mul__(self, other: "UnitLike") -> "Unit":
        if isinstance(other, (int, float)):
            return Unit(self.scale * other, self.dims)
        other = parse_unit(other)
        return Unit(self.scale * other.scale,
                    tuple(a + b for a, b in zip(self.dims, other.dims)))

    __rmul__ = __mul__

    def __truediv__(self, other: "UnitLike") -> "Unit":
        if isinstance(other, (int, float)):
            return Unit(self.scale / other, self.dims)
        other = parse_unit(other)
        return Unit(self.scale / other.scale,
                    tuple(a - b for a, b in zip(self.dims, other.dims)))

    def __rtruediv__(self, other) -> "Unit":
        if isinstance(other, (int, float)):
            return Unit(other / self.scale, tuple(-d for d in self.dims))
        return parse_unit(other) / self

    def __pow__(self, p: Union[int, float, Fraction]) -> "Unit":
        p = Fraction(p).limit_denominator(1000)
        return Unit(self.scale ** float(p), tuple(d * p for d in self.dims))

    # -- comparison -------------------------------------------------------
    def __eq__(self, other) -> bool:
        try:
            other = parse_unit(other)
        except (UnitError, TypeError):
            return NotImplemented
        return (math.isclose(self.scale, other.scale, rel_tol=1e-12)
                and self.dims == other.dims)

    def __hash__(self) -> int:
        return hash((round(math.log(self.scale) if self.scale > 0 else 0.0, 9),
                     self.dims))

    # -- queries ----------------------------------------------------------
    @property
    def dimensionless(self) -> bool:
        return all(d == 0 for d in self.dims)

    def same_dimensions(self, other: "UnitLike") -> bool:
        other = parse_unit(other)
        return self.dims[:4] == other.dims[:4]

    def ratio(self, other: "UnitLike", **context: float) -> float:
        """Conversion factor ``self → other``: ``x[self] * ratio == x[other]``.

        ``a``/``h`` exponents must either cancel or be resolvable from
        ``context`` (e.g. ``ratio("kpc", a=0.5, h=0.7)``).
        """
        other = parse_unit(other)
        if self.dims[:4] != other.dims[:4]:
            raise UnitError(
                f"incompatible dimensions: {self!s} vs {other!s}")
        factor = self.scale / other.scale
        for sym, exp in zip(("a", "h"), (self.dims[4] - other.dims[4],
                                         self.dims[5] - other.dims[5])):
            if exp != 0:
                if sym not in context:
                    raise UnitError(
                        f"cannot convert {self!s} → {other!s}: needs '{sym}'")
                factor *= float(context[sym]) ** float(exp)
        return factor

    def in_base(self) -> float:
        """SI scale, requires no unresolved a/h."""
        if self.dims[4] != 0 or self.dims[5] != 0:
            raise UnitError(f"{self!s} has unresolved a/h factors")
        return self.scale

    # -- repr -------------------------------------------------------------
    def __str__(self) -> str:
        return _format_unit(self)

    def __repr__(self) -> str:
        return f"Unit('{self!s}')"


UnitLike = Union[str, Unit, float, int]


# ---------------------------------------------------------------------------
# Named unit registry
# ---------------------------------------------------------------------------

_KPC_M = 3.0856775814913673e19  # kpc in metres (IAU 2015)
_MSOL_KG = 1.98892e30           # solar mass in kg (pynbody convention)
_YR_S = 3.1556926e7             # Julian-ish year in seconds (pynbody tropical)

_REGISTRY: dict = {}


def _register(name: str, scale: float, **dims) -> Unit:
    u = Unit(scale, _dimvec(**dims))
    _REGISTRY[name] = u
    return u


# dimensionless
dimensionless = _register("1", 1.0)
NoUnit = dimensionless
# lengths
_register("m", 1.0, L=1)
_register("cm", 1e-2, L=1)
_register("mm", 1e-3, L=1)
_register("km", 1e3, L=1)
_register("au", 1.495978707e11, L=1)
_register("pc", _KPC_M / 1e3, L=1)
_register("kpc", _KPC_M, L=1)
_register("Mpc", _KPC_M * 1e3, L=1)
_register("Gpc", _KPC_M * 1e6, L=1)
# masses
_register("kg", 1.0, M=1)
_register("g", 1e-3, M=1)
_register("Msol", _MSOL_KG, M=1)
# times
_register("s", 1.0, T=1)
_register("yr", _YR_S, T=1)
_register("kyr", _YR_S * 1e3, T=1)
_register("Myr", _YR_S * 1e6, T=1)
_register("Gyr", _YR_S * 1e9, T=1)
# temperature
_register("K", 1.0, K=1)
# cosmological symbols
_register("a", 1.0, a=1)
_register("h", 1.0, h=1)

#: Newton's constant, G = 6.6743e-11 m^3 kg^-1 s^-2 as a Unit (scale carries it).
G = Unit(6.674299999999999e-11, _dimvec(L=3, M=-1, T=-2))

_TOKEN_RE = re.compile(
    r"\s*([A-Za-z_][A-Za-z0-9_]*|[0-9]*\.?[0-9]+(?:[eE][+-]?[0-9]+)?)"
    r"(?:\s*\*\*\s*(-?[0-9]+(?:\.[0-9]+)?(?:/[0-9]+)?))?")


def parse_unit(spec: UnitLike) -> Unit:
    """Parse a pynbody-style unit string (or pass through Unit / number)."""
    if isinstance(spec, Unit):
        return spec
    if isinstance(spec, (int, float)):
        return Unit(float(spec), _dimvec())
    if spec is None:
        return dimensionless
    if not isinstance(spec, str):
        raise UnitError(f"cannot interpret {spec!r} as a unit")
    s = spec.strip()
    if not s or s == "1":
        return dimensionless
    result = Unit(1.0, _dimvec())
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            raise UnitError(f"malformed unit string: {spec!r} at {s[pos:]!r}")
        tok, exp = m.group(1), m.group(2)
        power = Fraction(exp) if exp else Fraction(1)
        if tok[0].isdigit() or tok[0] == ".":
            base = Unit(float(tok), _dimvec())
        else:
            if tok == "G":
                base = G
            elif tok in _REGISTRY:
                base = _REGISTRY[tok]
            else:
                raise UnitError(f"unknown unit name {tok!r} in {spec!r}")
        result = result * (base ** power)
        pos = m.end()
    return result


_DISPLAY_CANDIDATES = {
    "L": ("kpc", "Mpc", "pc", "km", "m", "cm", "au"),
    "M": ("Msol", "kg", "g"),
    "T": ("s", "Gyr", "Myr", "yr"),
    "K": ("K",),
    "a": ("a",),
    "h": ("h",),
}


def _format_unit(u: Unit) -> str:
    import itertools

    active = [(dim, exp) for dim, exp in zip(_DIMS, u.dims) if exp != 0]
    if not active:
        if math.isclose(u.scale, 1.0, rel_tol=1e-10):
            return "1"
        return f"{u.scale:.6g}"
    # brute-force the (small) candidate product; pick the combination whose
    # residual scale is closest to 1 (earlier candidates win ties, so the
    # astronomy-friendly kpc/Msol/Gyr defaults are preferred)
    pools = [_DISPLAY_CANDIDATES[dim] for dim, _ in active]
    best_combo, best_err = None, None
    for combo in itertools.product(*pools):
        r = u.scale
        for (dim, exp), cand in zip(active, combo):
            r /= _REGISTRY[cand].scale ** float(exp)
        err = abs(math.log10(abs(r))) if r != 0 else float("inf")
        if best_combo is None or err < best_err - 1e-12:
            best_combo, best_err = combo, err
    parts = []
    residual = u.scale
    for (dim, exp), cand in zip(active, best_combo):
        residual /= _REGISTRY[cand].scale ** float(exp)
        if exp == 1:
            parts.append(cand)
        else:
            e = int(exp) if exp.denominator == 1 else float(exp)
            parts.append(f"{cand}**{e}")
    if not math.isclose(residual, 1.0, rel_tol=1e-10):
        parts.insert(0, f"{residual:.6g}")
    return " ".join(parts)


class _UnitNamespace:
    """Attribute access to named units: ``units.kpc``, ``units.Msol``."""

    def __getattr__(self, name: str) -> Unit:
        try:
            return _REGISTRY[name]
        except KeyError:
            raise AttributeError(name) from None

    def __call__(self, spec: UnitLike) -> Unit:
        return parse_unit(spec)


units = _UnitNamespace()
