"""Scope specification and user-facing Scope builder.

Reference counterpart: ``core/calculate/scopes.py`` (ScopeSpec immutable
composition rules: ``with_filter`` AND-merges, ``with_transform`` appends;
``Scope.apply``/``Scope.pipeline``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

from .base import BoundCalculator, CalculatorBase
from .enums import RevertPolicy
from .transforms import TransformBase, TransformChain

__all__ = ["ScopeSpec", "Scope", "TransformScope"]


@dataclasses.dataclass(frozen=True)
class ScopeSpec:
    """Immutable (transforms, filter) pair (reference ``scopes.py:114``)."""
    transforms: Tuple[TransformBase, ...] = ()
    filter: Any = None
    revert: RevertPolicy = RevertPolicy.ALWAYS

    def with_filter(self, filt) -> "ScopeSpec":
        new = filt if self.filter is None else (self.filter & filt)
        return dataclasses.replace(self, filter=new)

    def with_transform(self, tr) -> "ScopeSpec":
        return dataclasses.replace(self, transforms=self.transforms + (tr,))

    def compose(self, other: "ScopeSpec") -> "ScopeSpec":
        filt = self.filter
        if other.filter is not None:
            filt = other.filter if filt is None else (filt & other.filter)
        return ScopeSpec(self.transforms + other.transforms, filt,
                         other.revert)

    def as_transform(self) -> Optional[TransformBase]:
        if not self.transforms:
            return None
        if len(self.transforms) == 1:
            return self.transforms[0]
        return TransformChain.of(*self.transforms)

    def signature(self) -> tuple:
        return ("scope",
                tuple(t.signature() for t in self.transforms),
                self.filter.signature() if self.filter is not None else None)

    @property
    def empty(self) -> bool:
        return not self.transforms and self.filter is None


class Scope:
    """User-facing scope builder (reference ``scopes.py:236``).

    >>> sc = Scope(filter=Sphere("30 kpc"), transform=ShiftPosTo("ssc"))
    >>> bound = sc.apply(KappaRot())
    """

    def __init__(self, filter=None, transform=None,
                 spec: Optional[ScopeSpec] = None):
        if spec is None:
            spec = ScopeSpec()
            if transform is not None:
                steps = (transform.steps if isinstance(transform, TransformChain)
                         else (transform,))
                for t in steps:
                    spec = spec.with_transform(t)
            if filter is not None:
                spec = spec.with_filter(filter)
        self.spec = spec

    def filter(self, filt) -> "Scope":
        return Scope(spec=self.spec.with_filter(filt))

    def transform(self, tr) -> "Scope":
        return Scope(spec=self.spec.with_transform(tr))

    def apply(self, calc: CalculatorBase) -> CalculatorBase:
        if self.spec.empty:
            return calc
        return BoundCalculator(calc, pre_filter=self.spec.filter,
                               pre_transform=self.spec.as_transform())

    def pipeline(self, outputs: Dict[str, CalculatorBase]):
        """Build a Pipeline whose every output runs under this scope."""
        from .pipeline import Pipeline
        return Pipeline({k: self.apply(v) for k, v in outputs.items()})


#: reference alias (``scopes.py:338``)
TransformScope = Scope
