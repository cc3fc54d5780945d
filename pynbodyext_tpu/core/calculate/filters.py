"""Filter role base and boolean combinators.

Reference counterpart: ``core/calculate/filters.py``.  A filter's raw value is
a :class:`FilterResult`; its public value is a boolean mask over the base
snapshot.  Filters compose with ``&``/``|``/``~`` (``.filter()``
pre-composition is rejected, reference ``filters.py:242-260``) and work
directly as snapshot indices: ``snap[filt]`` → masked :class:`ParticleView`
(the reference instead subclasses ``pynbody.filt.Filter``; here the snapshot
duck-types on :meth:`FilterBase.where`).

TPU-native divergence: the mask is the *only* artifact — no gathered subsnap
is ever materialized (SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from ...quantity import strip_units
from .base import CalculatorBase
from .enums import BuiltinKinds, CachePolicy, EffectPolicy
from .fields import ParamView

__all__ = ["FilterBase", "FilterResult", "AndFilter", "OrFilter", "NotFilter"]


@dataclasses.dataclass(frozen=True)
class FilterResult:
    """Raw value of a filter node: full-length bool mask + its source view."""
    mask: Any
    source: Any = None

    def count(self) -> int:
        return int(jnp.sum(self.mask))


def _normalize_mask(mask):
    """Coerce 0/1 arrays to bool (reference ``filters.py:147``)."""
    mask = strip_units(mask)
    mask = jnp.asarray(mask)
    if mask.dtype != jnp.bool_:
        mask = mask.astype(bool)
    return mask


class FilterBase(CalculatorBase):
    node_kind = BuiltinKinds.FILTER
    effect = EffectPolicy.CONTEXTUAL  # params may be scope-dependent
    # masks are reused heavily within a run and are cheap relative to the
    # gathers they replace — always admit them to the run cache
    cache_policy = CachePolicy.FULL

    # -- subclass hook -----------------------------------------------------
    def build_mask(self, sim, params: ParamView):
        """Return a boolean mask over ``sim.base`` (full-length)."""
        raise NotImplementedError

    # -- engine protocol ------------------------------------------------------
    def compute(self, ctx, input, params: ParamView) -> FilterResult:
        mask = _normalize_mask(self.build_mask(input.active, params))
        return FilterResult(mask=mask, source=input.active)

    def public_value_from_raw(self, raw: FilterResult):
        return raw.mask

    # -- standalone use (snap[filt], reference ``filters.py:124,139``) --------
    def where(self, sim):
        """Boolean mask without a run context (standalone resolution)."""
        from .params import StandaloneValueResolver, resolve_value_for
        resolver = StandaloneValueResolver(sim)
        specs = self.param_specs()
        resolved = {k: resolve_value_for(v, specs.get(k), resolver)
                    for k, v in self.param_values().items()}
        return _normalize_mask(self.build_mask(sim, ParamView(resolved)))

    # -- composition rules ------------------------------------------------------
    def filter(self, filt):
        raise TypeError(
            "filters do not pre-compose via .filter(); combine with & | ~ "
            "(reference filters.py:242-260)")

    def __and__(self, other):
        if isinstance(other, FilterBase):
            return AndFilter(self, other)
        return super().__and__(other)

    def __or__(self, other):
        if isinstance(other, FilterBase):
            return OrFilter(self, other)
        return NotImplemented

    def __invert__(self):
        return NotFilter(self)


class _CombinatorFilter(FilterBase):
    """Base for And/Or/Not: children evaluated through the ctx so their
    masks share the run cache (reference ``filters.py:263-313``)."""

    _symbol = "?"

    def __init__(self, *children: FilterBase):
        CalculatorBase.__init__(self)
        self.children = tuple(children)

    def param_values(self):
        return {}

    def instance_signature(self):
        return (self._symbol, tuple(c.signature() for c in self.children))

    def declared_dependencies(self):
        return list(self.children)

    def compute(self, ctx, input, params):
        masks = [ctx.public_value(c, input) for c in self.children]
        return FilterResult(mask=self._combine(masks), source=input.active)

    def where(self, sim):
        masks = [c.where(sim) for c in self.children]
        return _normalize_mask(self._combine(masks))

    def _combine(self, masks):
        raise NotImplementedError

    @property
    def label(self):
        return self._name or f"({f' {self._symbol} '.join(c.label for c in self.children)})"


class AndFilter(_CombinatorFilter):
    _symbol = "&"

    def _combine(self, masks):
        out = masks[0]
        for m in masks[1:]:
            out = jnp.logical_and(out, m)
        return out


class OrFilter(_CombinatorFilter):
    _symbol = "|"

    def _combine(self, masks):
        out = masks[0]
        for m in masks[1:]:
            out = jnp.logical_or(out, m)
        return out


class NotFilter(_CombinatorFilter):
    _symbol = "~"

    def __init__(self, child: FilterBase):
        super().__init__(child)

    def _combine(self, masks):
        return jnp.logical_not(masks[0])

    @property
    def label(self):
        return self._name or f"~{self.children[0].label}"
