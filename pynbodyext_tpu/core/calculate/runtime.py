"""Thin runtime facades passed to advanced calculator hooks.

Reference counterpart: ``core/calculate/runtime.py`` (CalcRuntime,
TransformRuntime).
"""

from __future__ import annotations

__all__ = ["CalcRuntime", "TransformRuntime"]


class CalcRuntime:
    """Facade over (ctx, input, node) for ``calculate_with_runtime`` hooks."""

    __slots__ = ("ctx", "input", "node")

    def __init__(self, ctx, input, node):
        self.ctx = ctx
        self.input = input
        self.node = node

    @property
    def sim(self):
        return self.input.active

    def evaluate(self, node):
        return self.ctx.evaluate(node, self.input)

    def public_value(self, node):
        return self.ctx.public_value(node, self.input)

    def raw_value(self, node):
        return self.ctx.raw_value(node, self.input)

    def phase(self, name: str):
        return self.ctx.phase(self.node, name)


class TransformRuntime(CalcRuntime):
    """Adds the measurement view for transforms with ``measure_with``."""

    __slots__ = ("measure_input",)

    def __init__(self, ctx, input, node, measure_input):
        super().__init__(ctx, input, node)
        self.measure_input = measure_input

    @property
    def measure_sim(self):
        return self.measure_input.active

    @property
    def target(self):
        return self.input.base_snapshot
