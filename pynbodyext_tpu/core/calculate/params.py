"""Dynamic parameter resolution.

Reference counterpart: ``core/calculate/params.py``.  Constructor arguments of
a calculator may be:

* plain constants (numbers, strings, arrays, QArrays);
* **unit strings** like ``"30 kpc"`` — coerced into the units of a target sim
  field when the :class:`~.fields.ParamSpec` declares ``units_of``/``units``;
* **callables** — ``f(sim)`` or ``f(ctx, input)``, arity-sniffed
  (reference ``params.py:249-268``);
* **other calculators** — evaluated through the execution context so their
  values are shared via the run cache (reference ``params.py:222-231``);
* nested lists/tuples/dicts of the above.

Two resolver strategies mirror the reference: :class:`RuntimeValueResolver`
(inside a run, shares the run cache) and :class:`StandaloneValueResolver`
(out-of-run, e.g. ``filter.where(sim)`` used directly).
"""

from __future__ import annotations

import inspect
from typing import Any, List, Optional

import numpy as np

from ...quantity import QArray
from ...units import UnitError, parse_unit
from .fields import ParamSpec

__all__ = ["value_signature", "extract_dependencies", "RuntimeValueResolver",
           "StandaloneValueResolver", "resolve_value_for",
           "resolve_param_for_sim"]

_SMALL_ARRAY = 16


def _is_calculator(v) -> bool:
    from .base import CalculatorBase
    return isinstance(v, CalculatorBase)


# ---------------------------------------------------------------------------
# Signatures (structural identity fragments, reference ``params.py:161``)
# ---------------------------------------------------------------------------

def value_signature(v: Any) -> Any:
    if _is_calculator(v):
        return v.signature()
    if isinstance(v, QArray):
        return ("qarr", value_signature(v.value), str(v.units))
    if hasattr(v, "shape") and hasattr(v, "dtype"):
        arr = np.asarray(v)
        if arr.size <= _SMALL_ARRAY:
            return ("arr", arr.shape, str(arr.dtype),
                    tuple(arr.reshape(-1).tolist()))
        return ("arr*", arr.shape, str(arr.dtype), id(v))
    if callable(v):
        return ("fn", getattr(v, "__qualname__", repr(v)), id(v))
    if isinstance(v, (list, tuple)):
        return ("seq", tuple(value_signature(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, value_signature(x))
                                    for k, x in v.items())))
    if isinstance(v, (int, float, complex, bool, str, bytes, type(None))):
        return v
    return ("obj", type(v).__qualname__, id(v))


def extract_dependencies(v: Any) -> List:
    """All calculator nodes reachable inside a parameter value."""
    out: List = []
    if _is_calculator(v):
        out.append(v)
    elif isinstance(v, (list, tuple)):
        for x in v:
            out.extend(extract_dependencies(x))
    elif isinstance(v, dict):
        for x in v.values():
            out.extend(extract_dependencies(x))
    return out


# ---------------------------------------------------------------------------
# Resolvers
# ---------------------------------------------------------------------------

class RuntimeValueResolver:
    """Resolve values inside a run: calculator deps share the run cache."""

    def __init__(self, ctx, input):
        self.ctx = ctx
        self.input = input

    @property
    def sim(self):
        return self.input.active

    def calculator_value(self, node):
        return self.ctx.public_value(node, self.input)

    def call(self, fn):
        return _call_sniffed(fn, self.sim, self.ctx, self.input)


class StandaloneValueResolver:
    """Resolve values outside a run (fresh silent mini-run per calculator)."""

    def __init__(self, sim):
        self.sim = sim

    def calculator_value(self, node):
        return node.run(self.sim, progress=None).value

    def call(self, fn):
        return _call_sniffed(fn, self.sim, None, None)


def _call_sniffed(fn, sim, ctx, input):
    """Call ``f(sim)`` or ``f(ctx, input)`` based on positional arity."""
    try:
        sig = inspect.signature(fn)
        pos = [p for p in sig.parameters.values()
               if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
        nargs = len(pos)
        if any(p.kind == p.VAR_POSITIONAL for p in sig.parameters.values()):
            nargs = 1
    except (TypeError, ValueError):
        nargs = 1
    if nargs >= 2 and ctx is not None:
        return fn(ctx, input)
    return fn(sim)


# ---------------------------------------------------------------------------
# Resolution
# ---------------------------------------------------------------------------

def resolve_value_for(value: Any, spec: Optional[ParamSpec], resolver) -> Any:
    """Resolve one parameter value with the given strategy."""
    if spec is not None and spec.static:
        return value
    if _is_calculator(value):
        resolved = resolver.calculator_value(value)
        return _coerce_units(resolved, spec, resolver.sim)
    if callable(value) and not isinstance(value, type):
        return _coerce_units(resolver.call(value), spec, resolver.sim)
    if isinstance(value, (list, tuple)):
        vals = [resolve_value_for(v, spec, resolver) for v in value]
        return type(value)(vals) if isinstance(value, tuple) else vals
    if isinstance(value, dict):
        return {k: resolve_value_for(v, spec, resolver)
                for k, v in value.items()}
    return _coerce_units(value, spec, resolver.sim)


def _coerce_units(value: Any, spec: Optional[ParamSpec], sim) -> Any:
    """Unit coercion (reference ``_convert_value_to_units`` ``params.py:280``).

    Targets: explicit ``spec.units`` or the units of sim field
    ``spec.units_of``.  Unit *strings* are parsed and converted to a raw
    float; QArrays are converted and unwrapped; raw numbers are assumed to
    already be in target units and pass through.
    """
    if spec is None or (spec.units_of is None and spec.units is None):
        return value
    target = None
    if spec.units is not None:
        target = parse_unit(spec.units)
    elif sim is not None and spec.units_of is not None:
        try:
            target = sim[spec.units_of].units
        except KeyError:
            target = None
    if target is None:
        return value
    ctx = sim.units_context() if sim is not None and hasattr(sim, "units_context") else {}
    if isinstance(value, str):
        try:
            u = parse_unit(value)
        except UnitError:
            return value  # non-unit string (e.g. a mode name) passes through
        return u.ratio(target, **ctx)
    if isinstance(value, QArray):
        return value.to_value(target, **ctx)
    return value


def resolve_param_for_sim(value: Any, sim, spec: Optional[ParamSpec] = None):
    """Standalone resolution helper (reference ``filt.py:60``)."""
    return resolve_value_for(value, spec, StandaloneValueResolver(sim))
