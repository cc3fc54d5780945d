"""Lazy arithmetic expression nodes.

Reference counterpart: ``core/calculate/expr.py`` — calculators compose
symbolically (``2 * re``, ``re + re``, ``radius ** 3``) into DAG nodes
evaluated inside the run context so shared subexpressions hit the run cache.
Includes associative add/mul flattening and constant folding
(reference ``expr.py:83-114``).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from ...quantity import QArray
from .base import CalculatorBase
from .enums import BuiltinKinds

__all__ = ["OpProperty", "ConstantProperty", "LambdaProperty",
           "as_property", "build_op"]

_ASSOCIATIVE = {"add", "mul"}


def _is_const(x) -> bool:
    return not isinstance(x, CalculatorBase) and not callable(x)


def as_property(x) -> CalculatorBase:
    """Coerce a value into a calculator node (reference ``expr.py:54``)."""
    if isinstance(x, CalculatorBase):
        return x
    if callable(x):
        return LambdaProperty(x)
    return ConstantProperty(x)


def build_op(op: str, operands: Tuple) -> CalculatorBase:
    """Build an OpProperty with flattening + constant folding."""
    ops = list(operands)
    if op in _ASSOCIATIVE:
        flat = []
        for o in ops:
            if isinstance(o, OpProperty) and o.op == op:
                flat.extend(o.operands)
            else:
                flat.append(o)
        consts = [o for o in flat if _is_const(o)]
        nodes = [o for o in flat if not _is_const(o)]
        if len(consts) > 1:
            folded = consts[0]
            for c in consts[1:]:
                folded = _apply_op(op, [folded, c])
            consts = [folded]
        ops = consts + nodes
        if len(ops) == 1 and _is_const(ops[0]):
            return ConstantProperty(ops[0])
    if all(_is_const(o) for o in ops):
        return ConstantProperty(_apply_op(op, ops))
    return OpProperty(op, tuple(ops))


def _apply_op(op: str, vals) -> Any:
    a = vals[0]
    b = vals[1] if len(vals) > 1 else None
    if op == "add":
        out = a
        for v in vals[1:]:
            out = out + v
        return out
    if op == "mul":
        out = a
        for v in vals[1:]:
            out = out * v
        return out
    if op == "sub":
        return a - b
    if op == "div":
        return a / b
    if op == "pow":
        return a ** b
    if op == "neg":
        return -a
    if op == "abs":
        return abs(a)
    if op == "lt":
        return a < b
    if op == "le":
        return a <= b
    if op == "gt":
        return a > b
    if op == "ge":
        return a >= b
    if op == "eq":
        return a == b
    if op == "ne":
        return a != b
    if op == "min":
        return jnp.minimum(_strip(a), _strip(b))
    if op == "max":
        return jnp.maximum(_strip(a), _strip(b))
    if op == "clip":
        lo, hi = vals[1], vals[2]
        if isinstance(a, QArray):
            return QArray(jnp.clip(a.value, _strip(lo), _strip(hi)), a.units)
        return jnp.clip(a, lo, hi)
    raise ValueError(f"unknown op {op!r}")


def _strip(x):
    return x.value if isinstance(x, QArray) else x


class OpProperty(CalculatorBase):
    """Operator node over calculator/constant operands (ref ``expr.py:199``)."""

    node_kind = BuiltinKinds.EXPR

    def __init__(self, op: str, operands: Tuple):
        super().__init__()
        self.op = op
        self.operands = tuple(operands)

    def param_values(self):
        return {}

    def instance_signature(self):
        from .params import value_signature
        return ("op", self.op,
                tuple(value_signature(o) for o in self.operands))

    def declared_dependencies(self):
        return [o for o in self.operands if isinstance(o, CalculatorBase)]

    def execute(self, ctx, input):
        with ctx.phase(self, "calculate"):
            vals = [ctx.public_value(o, input)
                    if isinstance(o, CalculatorBase) else o
                    for o in self.operands]
            return _apply_op(self.op, vals)

    @property
    def label(self):
        return self._name or f"op:{self.op}"

    def describe_params(self):
        from .display import compact_repr
        return f"{self.op}({', '.join(compact_repr(o, 25) for o in self.operands)})"


class ConstantProperty(CalculatorBase):
    """Constant leaf (reference ``expr.py:117``)."""

    node_kind = BuiltinKinds.CONSTANT

    def __init__(self, value: Any):
        super().__init__()
        self.value = value

    def param_values(self):
        return {}

    def instance_signature(self):
        from .params import value_signature
        return ("const", value_signature(self.value))

    def execute(self, ctx, input):
        return self.value

    def describe_params(self):
        from .display import compact_repr
        return compact_repr(self.value, 30)


class LambdaProperty(CalculatorBase):
    """Callable leaf: ``f(sim)`` or ``f(ctx, input)`` (ref ``expr.py:145``)."""

    node_kind = BuiltinKinds.LAMBDA
    cacheable = False  # opaque host function

    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def param_values(self):
        return {}

    def instance_signature(self):
        from .params import value_signature
        return ("lambda", value_signature(self.fn))

    def execute(self, ctx, input):
        from .params import _call_sniffed
        with ctx.phase(self, "calculate"):
            return _call_sniffed(self.fn, input.active, ctx, input)

    def describe_params(self):
        return getattr(self.fn, "__qualname__", repr(self.fn))


#: bridge kept for API parity with the reference (``expr.py:170``)
CalculatorValueProperty = as_property
