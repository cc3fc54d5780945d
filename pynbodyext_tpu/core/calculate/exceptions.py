"""Engine exceptions (reference: ``core/calculate/exceptions.py``)."""

from __future__ import annotations

__all__ = ["CalculatorError", "CycleError"]


class CalculatorError(RuntimeError):
    """Raised when a calculator node fails during evaluation."""


class CycleError(CalculatorError):
    """Raised when the dependency graph contains a cycle."""
