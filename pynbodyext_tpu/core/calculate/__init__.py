"""Calculator engine — lazy analysis DAGs over immutable snapshots.

TPU-native re-design of the reference's ``pynbodyext/core/calculate``
package (21 modules, SURVEY.md §2.1).  The engine is host-side Python (cheap,
untraced) driving jit-compiled leaf computations; graph semantics (per-run
cache, scope tokens, dynamic calculator-valued params) match the reference.

Quick tour::

    from pynbodyext_tpu.calculate import PropertyBase, Param

    @PropertyBase.dataclass
    class TotalMass(PropertyBase):
        parameter: str = "mass"
        def calculate(self, sim, params):
            from pynbodyext_tpu import ops
            return sim[params.parameter].sum()

    result = TotalMass().run(snap)        # → Result
    value  = TotalMass()(snap)            # → value directly
    scoped = TotalMass().filter(Sphere("30 kpc")).transform(ShiftPosTo("ssc"))
"""

from .base import (BoundCalculator, CalculatorBase, CombinedCalculator,
                   dataclass_calc)
from .cache import CacheEvent, ExecutionValue, RuntimeCache
from .context import (CompositeProgressSink, ExecutionContext,
                      LoggerProgressSink, NodeInput, NullProgressSink,
                      ProgressSink, RunOptions, TqdmProgressSink,
                      resolve_progress_sink)
from .display import compact_repr, format_mem, format_time
from .engine import EvalEngine
from .enums import (BuiltinKinds, CachePolicy, EffectPolicy, ErrorPolicy,
                    NodeStatus, RecordPolicy, RevertPolicy)
from .exceptions import CalculatorError, CycleError
from .expr import (ConstantProperty, LambdaProperty, OpProperty, as_property,
                   build_op)
from .fields import Param, ParamSpec, ParamView, collect_param_specs
from .filters import AndFilter, FilterBase, FilterResult, NotFilter, OrFilter
from .params import (RuntimeValueResolver, StandaloneValueResolver,
                     resolve_param_for_sim, value_signature)
from .perf import PerfCollector, PerfFormatter, PerfSummary
from .pipeline import Pipeline
from .properties import PropertyBase
from .result import (ErrorInfo, PhaseRecord, ProvenanceInfo, Result,
                     ResultNode)
from .runtime import CalcRuntime, TransformRuntime
from .scopes import Scope, ScopeSpec, TransformScope
from .base import CalculatorBase as RuntimeCalculatorBase  # API-parity alias
from .trace import TraceCollector, TraceEvent
from .transforms import (TransformBase, TransformChain, TransformPlan,
                         TransformResult, chain_transforms)

# ---------------------------------------------------------------------------
# Reference-name compatibility aliases (reference core/calculate/__init__.py
# __all__, lines 226+) — same concepts under their original names.
# ---------------------------------------------------------------------------
from .enums import validate_kind as normalize_kind  # noqa: E402
from .fields import ParamSpec as DynamicParamSpec  # noqa: E402
from .params import extract_dependencies as dynamic_value_dependencies
from .params import resolve_value_for as resolve_dynamic_value
from .params import resolve_value_for as resolve_value
from .params import value_signature as dynamic_value_signature
from .result import ValueSummary
from .trace import TraceEvent as LogEvent
from .transforms import TransformChain as TransformStep  # step alias
NodeKind = str  # node kinds are plain strings validated by normalize_kind

__all__ = [
    # base
    "CalculatorBase", "BoundCalculator", "CombinedCalculator", "dataclass_calc",
    # role bases
    "PropertyBase", "FilterBase", "TransformBase",
    # filters/transforms machinery
    "AndFilter", "OrFilter", "NotFilter", "FilterResult",
    "TransformChain", "TransformPlan", "TransformResult", "chain_transforms",
    # engine
    "EvalEngine", "ExecutionContext", "NodeInput", "RunOptions",
    "RuntimeCache", "ExecutionValue", "CacheEvent",
    # expr
    "OpProperty", "ConstantProperty", "LambdaProperty", "as_property", "build_op",
    # params/fields
    "Param", "ParamSpec", "ParamView", "collect_param_specs",
    "RuntimeValueResolver", "StandaloneValueResolver",
    "resolve_param_for_sim", "value_signature",
    # scopes/pipeline
    "Scope", "ScopeSpec", "TransformScope", "Pipeline",
    # results & reporting
    "Result", "ResultNode", "ErrorInfo", "PhaseRecord", "ProvenanceInfo",
    "TraceCollector", "TraceEvent", "PerfCollector", "PerfSummary",
    "PerfFormatter",
    # enums & errors
    "NodeStatus", "RecordPolicy", "EffectPolicy", "CachePolicy",
    "ErrorPolicy", "RevertPolicy", "BuiltinKinds",
    "CalculatorError", "CycleError",
    # progress
    "ProgressSink", "LoggerProgressSink", "TqdmProgressSink",
    "CompositeProgressSink", "NullProgressSink", "resolve_progress_sink",
    # misc
    "RuntimeCalculatorBase", "CalcRuntime", "TransformRuntime",
    "compact_repr", "format_time", "format_mem",
    # reference-name compatibility aliases
    "normalize_kind", "DynamicParamSpec", "dynamic_value_dependencies",
    "dynamic_value_signature", "resolve_dynamic_value", "resolve_value",
    "ValueSummary", "LogEvent", "TransformStep", "NodeKind",
]
