"""Transform role base and chains — pure frame→frame functions.

Reference counterpart: ``core/calculate/transforms.py``, whose transforms
mutate the snapshot in place and must carry revert handles
(``transforms.py:290,371``), disable caching, and track mutation generations.
The TPU-native engine replaces all of that with **functional snapshot
updates**: :meth:`TransformBase.apply` returns a *new* immutable
:class:`~...snap.Snapshot` (sharing untouched arrays), so

* revert = simply continuing to use the previous snapshot object (the
  BoundCalculator's revert phase is a trace marker only);
* transforms are cacheable — the same transform signature under the same
  scope token yields the same output frame, so repeated scoped pipelines pay
  for the transform once per run;
* chains need no cleanup-on-error bookkeeping (reference
  ``transforms.py:424-481``): an exception simply abandons intermediate
  frames to the GC.

Preserved semantics: ``measure_with(filter)`` resolves measurement params on
the filtered subset of the *pre-transform* frame while the transform applies
to the whole snapshot (reference ``transforms.py:227,255-271``); chain steps
see successive frames and later steps' dynamic params are measured on the
frame produced by earlier steps (``transforms.py:424-443``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

from .base import CalculatorBase
from .enums import BuiltinKinds, CachePolicy, EffectPolicy
from .fields import ParamView

__all__ = ["TransformBase", "TransformChain", "TransformResult",
           "chain_transforms", "TransformPlan"]


@dataclasses.dataclass(frozen=True)
class TransformResult:
    """Raw value of a transform node: the post-transform base snapshot."""
    snapshot: Any
    params: Optional[ParamView] = None


class TransformBase(CalculatorBase):
    node_kind = BuiltinKinds.TRANSFORM
    effect = EffectPolicy.CONTEXTUAL
    cacheable = True  # divergence from reference (safe: pure frames)
    # caching the TransformResult is what makes repeated scoped pipelines pay
    # for a transform once per run AND keeps downstream scope tokens stable
    cache_policy = CachePolicy.FULL

    # -- subclass hook -------------------------------------------------------
    def apply(self, snapshot, params: ParamView):
        """Return a new Snapshot (move-all semantics: applies to the whole
        base snapshot, reference ``resolve_target`` ``transforms.py:246``)."""
        raise NotImplementedError

    # -- measurement scope -----------------------------------------------------
    def measure_with(self, filt) -> "TransformBase":
        """Measure dynamic params on ``filt``-selected particles, transform
        the whole snapshot (reference ``transforms.py:227``)."""
        return self._clone(_measure_filter=filt)

    @property
    def measure_filter(self):
        return getattr(self, "_measure_filter", None)

    def instance_signature(self):
        sig = super().instance_signature()
        mf = self.measure_filter
        return (sig, mf.signature() if mf is not None else None)

    def declared_dependencies(self):
        deps = super().declared_dependencies()
        if self.measure_filter is not None:
            deps.append(self.measure_filter)
        return deps

    # -- engine protocol ---------------------------------------------------------
    def execute(self, ctx, input) -> TransformResult:
        measure_input = input
        if self.measure_filter is not None:
            with ctx.phase(self, "measure_filter"):
                fres = ctx.raw_value(self.measure_filter, input)
                measure_input = input.with_selection(
                    fres, self.measure_filter.signature())
        with ctx.phase(self, "resolve_params"):
            params = self.resolve_params(ctx, measure_input)
            params = self.prepare_params(ctx, measure_input, params)
        with ctx.phase(self, "calculate"):
            new_snap = self.apply(input.base_snapshot, params)
        return TransformResult(snapshot=new_snap, params=params)

    def public_value_from_raw(self, raw: TransformResult):
        return raw.snapshot

    # -- chaining -------------------------------------------------------------
    def then(self, other) -> "TransformChain":
        return TransformChain.of(self, other)

    # standalone application (out-of-run convenience)
    def apply_to(self, snapshot):
        """Apply outside a run: resolve params standalone, return new snapshot."""
        from .params import StandaloneValueResolver, resolve_value_for
        base = snapshot.base if hasattr(snapshot, "base") else snapshot
        view = snapshot
        if self.measure_filter is not None:
            mask = self.measure_filter.where(snapshot)
            view = base[mask]
        resolver = StandaloneValueResolver(view)
        specs = self.param_specs()
        resolved = {k: resolve_value_for(v, specs.get(k), resolver)
                    for k, v in self.param_values().items()}
        return self.apply(base, ParamView(resolved))


class TransformChain(TransformBase):
    """Sequential transform composition (reference ``transforms.py:387``)."""

    def __init__(self, steps: Tuple[TransformBase, ...]):
        CalculatorBase.__init__(self)
        self.steps = tuple(steps)

    @classmethod
    def of(cls, *parts) -> "TransformChain":
        steps: list = []
        for p in parts:
            if isinstance(p, TransformChain):
                steps.extend(p.steps)
            elif isinstance(p, TransformBase):
                steps.append(p)
            else:
                raise TypeError(f"not a transform: {type(p).__name__}")
        return cls(tuple(steps))

    def then(self, other) -> "TransformChain":
        return TransformChain.of(self, other)

    def param_values(self):
        return {}

    def instance_signature(self):
        return ("chain", tuple(s.signature() for s in self.steps))

    def declared_dependencies(self):
        return list(self.steps)

    def execute(self, ctx, input) -> TransformResult:
        work = input
        for step in self.steps:
            res = ctx.raw_value(step, work)
            work = work.with_transform(res, step.signature())
        return TransformResult(snapshot=work.base_snapshot)

    def apply_to(self, snapshot):
        cur = snapshot
        for step in self.steps:
            cur = step.apply_to(cur)
        return cur

    @property
    def label(self):
        return self._name or "→".join(s.label for s in self.steps)

    def describe_params(self):
        return " → ".join(s.label for s in self.steps)


#: reference aliases (``transforms.py:488,495``)
TransformPlan = TransformChain


def chain_transforms(*steps) -> TransformChain:
    return TransformChain.of(*steps)
