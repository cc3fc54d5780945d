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
        if hasattr(self.mask, "count"):
            return int(self.mask.count())
        return int(jnp.sum(self.mask))


def _normalize_mask(mask):
    """Coerce 0/1 arrays to bool (reference ``filters.py:147``)."""
    if hasattr(mask, "chunk_mask_fn"):
        return mask  # lazy chunked mask: normalized per chunk at build time
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
        sim = input.active
        if hasattr(sim, "chunk_view"):
            # chunked snapshot: masks stay lazy, one chunk at a time — the
            # SAME build_mask runs per chunk on a chunk-local view
            def mask_fn(i, _f=self, _p=params, _s=sim):
                return _normalize_mask(_f.build_mask(_s.chunk_view(i), _p))
            return FilterResult(mask=sim.make_chunk_mask(mask_fn),
                                source=sim)
        mask = _normalize_mask(self.build_mask(sim, params))
        return FilterResult(mask=mask, source=sim)

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


def _fold_masks(masks, op):
    """Reduce masks with ``op``, transparently composing lazy chunked
    masks (duck-typed on ``chunk_mask_fn``) with each other and with
    full-length arrays."""
    chunked = [m for m in masks if hasattr(m, "chunk_mask_fn")]
    if not chunked:
        out = masks[0]
        for m in masks[1:]:
            out = op(out, m)
        return out
    store = chunked[0].store

    def fn_of(m):
        if hasattr(m, "chunk_mask_fn"):
            return m.chunk_mask_fn
        arr = m  # full-length array → per-chunk slices

        def sliced(i):
            lo, hi = store.chunk_bounds(i)
            return jnp.asarray(arr[lo:hi])
        return sliced

    fns = [fn_of(m) for m in masks]

    def combined(i):
        out = fns[0](i)
        for f in fns[1:]:
            out = op(out, f(i))
        return out
    return type(chunked[0])(store, combined)


class AndFilter(_CombinatorFilter):
    _symbol = "&"

    def _combine(self, masks):
        return _fold_masks(masks, jnp.logical_and)


class OrFilter(_CombinatorFilter):
    _symbol = "|"

    def _combine(self, masks):
        return _fold_masks(masks, jnp.logical_or)


class NotFilter(_CombinatorFilter):
    _symbol = "~"

    def __init__(self, child: FilterBase):
        super().__init__(child)

    def _combine(self, masks):
        m = masks[0]
        if hasattr(m, "chunk_mask_fn"):
            fn = m.chunk_mask_fn
            return type(m)(m.store, lambda i: jnp.logical_not(fn(i)))
        return jnp.logical_not(m)

    @property
    def label(self):
        return self._name or f"~{self.children[0].label}"
