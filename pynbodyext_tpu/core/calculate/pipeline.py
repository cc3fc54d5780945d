"""Named multi-output node (reference: ``core/calculate/pipeline.py``).

Evaluates each output through the shared run context (so common dependencies
hit the cache once), registers names, returns an ordered dict.  Honors
``ErrorPolicy.COLLECT_PARTIAL``: a failing output becomes ``None`` while the
rest of the pipeline completes (reference ``pipeline.py:196-215``).
"""

from __future__ import annotations

from typing import Dict, Mapping

from .base import CalculatorBase
from .enums import BuiltinKinds, ErrorPolicy, NodeStatus

__all__ = ["Pipeline"]


class Pipeline(CalculatorBase):
    node_kind = BuiltinKinds.PIPELINE

    def __init__(self, outputs: Mapping[str, CalculatorBase]):
        super().__init__()
        names = list(outputs)
        if len(set(names)) != len(names):
            raise ValueError("duplicate pipeline output names")
        # register each output under its name for Result.named access
        self.outputs: Dict[str, CalculatorBase] = {
            k: (v if v.name else v.named(k)) for k, v in outputs.items()}

    def param_values(self):
        return {}

    def instance_signature(self):
        return ("pipeline",
                tuple((k, v.signature()) for k, v in self.outputs.items()))

    def declared_dependencies(self):
        return list(self.outputs.values())

    def execute(self, ctx, input):
        partial = ctx.options.errors == ErrorPolicy.COLLECT_PARTIAL
        results: Dict[str, object] = {}
        for name, node in self.outputs.items():
            if partial:
                # per-evaluate policy override — one failing output becomes
                # None without mutating the shared run options
                rec = ctx.evaluate(node, input, errors=ErrorPolicy.COLLECT)
                results[name] = (None if rec.status == NodeStatus.ERROR
                                 else rec.public)
            else:
                results[name] = ctx.public_value(node, input)
        return results

    def describe_params(self):
        return ", ".join(self.outputs)
