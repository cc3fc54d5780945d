"""Calculator node base classes — the DAG vocabulary of the engine.

Reference counterpart: ``core/calculate/base.py`` (CalculatorBase,
BoundCalculator, CombinedCalculator).  Same public surface — structural
``signature()``/``signature_hash()``, ``dependencies()``, fluent
``.filter()/.transform()/.named()/.keep()/.with_cache()``, arithmetic
overloads delegating to the expr layer, ``run()``/``__call__`` — on top of a
purely functional scope model: the BoundCalculator's transform phase produces
a *new immutable snapshot* instead of mutating in place, so the revert phase
is a semantic no-op and caching stays enabled under transforms (the reference
must disable it, ``base.py:912``; we instead key the cache on the scope
token).
"""

from __future__ import annotations

import copy
import dataclasses
import hashlib
from typing import Any, Dict, Generic, List, Optional, Tuple, TypeVar

from .display import compact_repr
from .enums import BuiltinKinds, CachePolicy, EffectPolicy, RecordPolicy
from .exceptions import CycleError
from .fields import ParamView, collect_param_specs
from .params import (RuntimeValueResolver, extract_dependencies,
                     resolve_value_for, value_signature)

__all__ = ["CalculatorBase", "BoundCalculator", "CombinedCalculator",
           "dataclass_calc"]

TRaw = TypeVar("TRaw")
TPublic = TypeVar("TPublic")


def dataclass_calc(cls=None, /, **dc_kwargs):
    """Decorator turning a calculator class into a declarative dataclass.

    Reference: ``core/calculate/declarative.py:46-80`` (``dataclass_calc``,
    exposed as ``PropertyBase.dataclass`` etc.).  Installs a ``__post_init__``
    that runs the node-state initialisation after the generated ``__init__``.
    """

    def wrap(klass):
        orig_post = klass.__dict__.get("__post_init__")

        def __post_init__(self):
            CalculatorBase.__node_init__(self)
            if orig_post is not None:
                orig_post(self)

        klass.__post_init__ = __post_init__
        klass = dataclasses.dataclass(eq=False, repr=False, **dc_kwargs)(klass)
        return klass

    return wrap(cls) if cls is not None else wrap


class CalculatorBase(Generic[TRaw, TPublic]):
    """Abstract DAG node.  Subclass via the role bases
    (:class:`~.properties.PropertyBase`, :class:`~.filters.FilterBase`,
    :class:`~.transforms.TransformBase`) — usually with ``@Role.dataclass``.
    """

    # -- class-level policy attributes (reference ``base.py:231-235``)
    node_kind: str = BuiltinKinds.PROPERTY
    effect: EffectPolicy = EffectPolicy.PURE
    cacheable: bool = True
    cache_policy: CachePolicy = CachePolicy.AUTO
    record_policy: Optional[RecordPolicy] = None
    default_options: Dict[str, Any] = {}

    # -- node-state ------------------------------------------------------
    def __init__(self):
        self.__node_init__()

    def __node_init__(self):
        self._name: Optional[str] = None
        self._keep: bool = False
        self._cache_override: Optional[CachePolicy] = None
        self._record_override: Optional[RecordPolicy] = None

    # expose the declarative decorator on every role base
    dataclass = classmethod(lambda cls, klass=None, **kw:
                            dataclass_calc(klass, **kw) if klass is not None
                            else dataclass_calc(**kw))

    # -- params ------------------------------------------------------------
    def param_specs(self):
        return collect_param_specs(type(self))

    def param_values(self) -> Dict[str, Any]:
        if dataclasses.is_dataclass(self):
            return {f.name: getattr(self, f.name)
                    for f in dataclasses.fields(self)}
        return {}

    def resolve_params(self, ctx, input) -> ParamView:
        resolver = RuntimeValueResolver(ctx, input)
        specs = self.param_specs()
        resolved = {k: resolve_value_for(v, specs.get(k), resolver)
                    for k, v in self.param_values().items()}
        return ParamView(resolved)

    # -- structural identity (reference ``base.py:468,521``) -----------------
    def instance_signature(self) -> tuple:
        return tuple(sorted((k, value_signature(v))
                            for k, v in self.param_values().items()))

    _sig_in_progress: set = set()  # class-level re-entrancy guard

    def signature(self) -> tuple:
        key = id(self)
        if key in CalculatorBase._sig_in_progress:
            raise CycleError(
                f"dependency cycle through {type(self).__qualname__} "
                "(self-referential parameter structure)")
        CalculatorBase._sig_in_progress.add(key)
        try:
            return ("node", type(self).__qualname__,
                    self.instance_signature())
        finally:
            CalculatorBase._sig_in_progress.discard(key)

    def signature_hash(self) -> str:
        return hashlib.sha1(repr(self.signature()).encode()).hexdigest()[:16]

    # -- dependency graph (reference ``base.py:457``) -------------------------
    def declared_dependencies(self) -> List["CalculatorBase"]:
        deps: List[CalculatorBase] = []
        for v in self.param_values().values():
            deps.extend(extract_dependencies(v))
        return deps

    def extra_dependencies(self) -> List["CalculatorBase"]:
        return []

    def dependencies(self) -> List["CalculatorBase"]:
        return self.declared_dependencies() + self.extra_dependencies()

    # -- fluent API (reference ``base.py:684-732``) ---------------------------
    def _clone(self, **attrs) -> "CalculatorBase":
        c = copy.copy(self)
        for k, v in attrs.items():
            setattr(c, k, v)
        return c

    def named(self, name: str) -> "CalculatorBase":
        return self._clone(_name=name)

    def keep(self) -> "CalculatorBase":
        return self._clone(_keep=True)

    def with_cache(self, policy: CachePolicy | str = CachePolicy.FULL):
        return self._clone(_cache_override=CachePolicy(policy))

    def with_record(self, policy: RecordPolicy | str):
        return self._clone(_record_override=RecordPolicy(policy))

    @property
    def name(self) -> Optional[str]:
        return getattr(self, "_name", None)

    @property
    def label(self) -> str:
        return self._name or type(self).__name__

    def filter(self, filt) -> "BoundCalculator":
        return BoundCalculator(self, pre_filter=filt)

    def transform(self, tr) -> "BoundCalculator":
        return BoundCalculator(self, pre_transform=tr)

    # -- composition ----------------------------------------------------------
    def __and__(self, other):
        if isinstance(other, CalculatorBase):
            return CombinedCalculator.combine(self, other)
        return NotImplemented

    # -- arithmetic delegates (reference ``base.py:761-793``) -------------------
    def _expr(self, op, *operands):
        from .expr import build_op
        return build_op(op, operands)

    def __add__(self, other):
        return self._expr("add", self, other)

    def __radd__(self, other):
        return self._expr("add", other, self)

    def __sub__(self, other):
        return self._expr("sub", self, other)

    def __rsub__(self, other):
        return self._expr("sub", other, self)

    def __mul__(self, other):
        return self._expr("mul", self, other)

    def __rmul__(self, other):
        return self._expr("mul", other, self)

    def __truediv__(self, other):
        return self._expr("div", self, other)

    def __rtruediv__(self, other):
        return self._expr("div", other, self)

    def __pow__(self, other):
        return self._expr("pow", self, other)

    def __neg__(self):
        return self._expr("neg", self)

    def __abs__(self):
        return self._expr("abs", self)

    # -- execution protocol -------------------------------------------------
    def execute(self, ctx, input) -> Any:
        """Default lifecycle: resolve params → compute (reference
        ``template.py:90-101``)."""
        with ctx.phase(self, "resolve_params"):
            params = self.resolve_params(ctx, input)
            params = self.prepare_params(ctx, input, params)
        with ctx.phase(self, "calculate"):
            return self.compute(ctx, input, params)

    def prepare_params(self, ctx, input, params: ParamView) -> ParamView:
        return params

    def compute(self, ctx, input, params: ParamView) -> Any:
        raise NotImplementedError(
            f"{type(self).__qualname__} must implement compute()")

    def public_value_from_raw(self, raw: Any) -> Any:
        return raw

    # -- run entry (reference ``base.py:559,643``) ----------------------------
    def run(self, sim, **options):
        from .context import RunOptions
        from .engine import EvalEngine
        merged = dict(self.default_options)
        merged.update(options)
        opts = RunOptions(**merged) if not isinstance(
            merged.get("options"), RunOptions) else merged["options"]
        return EvalEngine(opts).run(self, sim)

    def __call__(self, sim, **options):
        return self.run(sim, **options).value

    # -- display ----------------------------------------------------------------
    def describe_params(self) -> str:
        return ", ".join(f"{k}={compact_repr(v, 40)}"
                         for k, v in self.param_values().items())

    def format_tree(self, _depth: int = 0, _seen=None) -> str:
        """Indented dependency tree (reference ``base.py:797``)."""
        _seen = _seen if _seen is not None else set()
        pad = "  " * _depth
        me = f"{pad}{self.label}({self.describe_params()})"
        sig = self.signature()
        if sig in _seen:
            return me + "  [shared]"
        _seen.add(sig)
        lines = [me]
        for dep in self.dependencies():
            lines.append(dep.format_tree(_depth + 1, _seen))
        return "\n".join(lines)

    def __repr__(self):
        return f"<{type(self).__qualname__}({self.describe_params()})>"

    def _repr_html_(self):  # notebook rendering (reference display.py:78-160)
        from .display import html_pre
        head = (f"<b>{type(self).__qualname__}</b> "
                f"<span style='color:#888'>&lt;{self.node_kind}&gt;</span>")
        return head + html_pre(self.format_tree())


class CombinedCalculator(CalculatorBase):
    """Tuple-of-values node: ``calc_a & calc_b`` (reference ``base.py:1060``)."""

    node_kind = BuiltinKinds.COMBINED

    def __init__(self, parts: Tuple[CalculatorBase, ...]):
        super().__init__()
        self.parts = tuple(parts)

    @classmethod
    def combine(cls, a: CalculatorBase, b: CalculatorBase):
        parts: List[CalculatorBase] = []
        for x in (a, b):
            if isinstance(x, CombinedCalculator):
                parts.extend(x.parts)
            else:
                parts.append(x)
        return cls(tuple(parts))

    def param_values(self):
        return {}

    def instance_signature(self):
        return tuple(p.signature() for p in self.parts)

    def declared_dependencies(self):
        return list(self.parts)

    def execute(self, ctx, input):
        with ctx.phase(self, "calculate"):
            return tuple(ctx.public_value(p, input) for p in self.parts)

    def describe_params(self):
        return " & ".join(p.label for p in self.parts)


class BoundCalculator(CalculatorBase):
    """Scope wrapper executing transform → filter → calculate phases.

    Reference: ``base.py:874`` (execute at ``base.py:980-1008``).  The revert
    phase exists only as a trace marker — immutable frames make it free.
    """

    node_kind = BuiltinKinds.BOUND
    effect = EffectPolicy.CONTEXTUAL

    def __init__(self, base: CalculatorBase,
                 pre_filter=None, pre_transform=None):
        super().__init__()
        if isinstance(base, BoundCalculator):
            # merge scopes: inner bound's scope composes with the new one
            pre_filter = _and_filters(base.pre_filter, pre_filter)
            pre_transform = _chain_transforms(base.pre_transform, pre_transform)
            base = base.base
        self.base = base
        self.pre_filter = pre_filter
        self.pre_transform = _as_transform(pre_transform)

    # narrow/extend the scope fluently
    def filter(self, filt) -> "BoundCalculator":
        return BoundCalculator(self.base,
                               pre_filter=_and_filters(self.pre_filter, filt),
                               pre_transform=self.pre_transform)

    def transform(self, tr) -> "BoundCalculator":
        return BoundCalculator(self.base, pre_filter=self.pre_filter,
                               pre_transform=_chain_transforms(
                                   self.pre_transform, tr))

    def param_values(self):
        return {}

    def instance_signature(self):
        return ("bound", self.base.signature(),
                self.pre_filter.signature() if self.pre_filter else None,
                self.pre_transform.signature() if self.pre_transform else None)

    def declared_dependencies(self):
        deps = [self.base]
        if self.pre_filter is not None:
            deps.append(self.pre_filter)
        if self.pre_transform is not None:
            deps.append(self.pre_transform)
        return deps

    @property
    def label(self) -> str:
        if self._name:
            return self._name
        bits = [self.base.label]
        if self.pre_transform is not None:
            bits.append(f"transform={self.pre_transform.label}")
        if self.pre_filter is not None:
            bits.append(f"filter={self.pre_filter.label}")
        return f"{bits[0]}[{', '.join(bits[1:])}]" if len(bits) > 1 else bits[0]

    def execute(self, ctx, input):
        work = input
        if self.pre_transform is not None:
            with ctx.phase(self, "transform"):
                tres = ctx.raw_value(self.pre_transform, work)
                # pass the structural signature so the scope token stays
                # deterministic (id-based fallbacks disable disk caching)
                work = work.with_transform(tres,
                                           self.pre_transform.signature())
        if self.pre_filter is not None:
            with ctx.phase(self, "filter"):
                fres = ctx.raw_value(self.pre_filter, work)
                work = work.with_selection(fres,
                                           self.pre_filter.signature())
        with ctx.phase(self, "calculate"):
            raw = ctx.raw_value(self.base, work)
        if self.pre_transform is not None:
            with ctx.phase(self, "revert"):
                pass  # immutable frames: outer scope still sees `input`
        return raw

    def public_value_from_raw(self, raw):
        return self.base.public_value_from_raw(raw)

    def describe_params(self):
        return ""  # the label already carries the scope decorations


def _and_filters(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a & b


def _as_transform(tr):
    if tr is None:
        return None
    from .transforms import TransformBase, TransformChain
    if isinstance(tr, (TransformBase, TransformChain)):
        return tr
    raise TypeError(f"expected a transform, got {type(tr).__name__}")


def _chain_transforms(a, b):
    if a is None:
        return _as_transform(b)
    if b is None:
        return _as_transform(a)
    return _as_transform(a).then(b)
