"""Lifecycle template (reference: ``core/calculate/template.py``).

In this engine the resolve_params→calculate lifecycle lives directly on
:class:`~.base.CalculatorBase.execute`; ``RuntimeCalculatorBase`` is kept as
an alias for API parity with the reference.
"""

from __future__ import annotations

from .base import CalculatorBase

__all__ = ["RuntimeCalculatorBase"]

RuntimeCalculatorBase = CalculatorBase
