"""Property role base: scalar/array derived quantities.

Reference counterpart: ``core/calculate/properties.py`` (hook ladder
``calculate(sim, params)`` → ``calculate_with_runtime`` → ``compute``;
full symbolic operator set; ``__bool__`` raises).
"""

from __future__ import annotations

from typing import Generic, TypeVar

from .base import CalculatorBase
from .enums import BuiltinKinds
from .fields import ParamView

__all__ = ["PropertyBase"]

T = TypeVar("T")


class PropertyBase(CalculatorBase, Generic[T]):
    node_kind = BuiltinKinds.PROPERTY

    # -- hook ladder (reference ``properties.py:134-166``) ------------------
    def compute(self, ctx, input, params: ParamView) -> T:
        from .runtime import CalcRuntime
        return self.calculate_with_runtime(CalcRuntime(ctx, input, self),
                                           params)

    def calculate_with_runtime(self, runtime, params: ParamView) -> T:
        return self.calculate(runtime.sim, params)

    def calculate(self, sim, params: ParamView) -> T:
        raise NotImplementedError(
            f"{type(self).__qualname__} must implement calculate()")

    # -- extra symbolic operators beyond CalculatorBase's arithmetic ---------
    def clip(self, lo, hi):
        return self._expr("clip", self, lo, hi)

    def lt(self, other):
        return self._expr("lt", self, other)

    def le(self, other):
        return self._expr("le", self, other)

    def gt(self, other):
        return self._expr("gt", self, other)

    def ge(self, other):
        return self._expr("ge", self, other)

    def eq_(self, other):
        return self._expr("eq", self, other)

    def ne(self, other):
        return self._expr("ne", self, other)

    def min_with(self, other):
        return self._expr("min", self, other)

    def max_with(self, other):
        return self._expr("max", self, other)

    def __bool__(self):
        raise TypeError(
            "PropertyBase nodes are symbolic; evaluate via run(sim) before "
            "using as a boolean (reference properties.py:293)")
