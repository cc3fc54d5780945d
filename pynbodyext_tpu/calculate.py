"""Short facade over :mod:`pynbodyext_tpu.core.calculate`.

Reference counterpart: ``pynbodyext/calculate.py`` (re-exports the main
engine names under a short import path).
"""

from .core.calculate import (BoundCalculator, CalculatorBase,
                             CombinedCalculator, EvalEngine, FilterBase,
                             Param, ParamView, Pipeline, PropertyBase,
                             Result, RunOptions, Scope, TransformBase,
                             TransformChain, chain_transforms)

__all__ = [
    "CalculatorBase", "BoundCalculator", "CombinedCalculator",
    "PropertyBase", "FilterBase", "TransformBase", "TransformChain",
    "chain_transforms", "Pipeline", "Scope",
    "EvalEngine", "RunOptions", "Result", "Param", "ParamView",
]
