"""Shared type aliases and protocols (reference: ``pynbodyext/util/_type.py``)."""

from __future__ import annotations

from typing import Any, Callable, Protocol, Union, runtime_checkable

import jax
import numpy as np

__all__ = ["UnitLike", "SnapArray", "FilterLike", "SimCallable",
           "SignatureProvider", "get_signature_safe"]

#: anything coercible into a Unit
UnitLike = Union[str, float, int, "Unit"]  # noqa: F821

#: device or host array
SnapArray = Union[np.ndarray, jax.Array, "QArray"]  # noqa: F821

#: anything accepted as a filter (calculator filter or raw boolean mask)
FilterLike = Union["FilterBase", np.ndarray, jax.Array]  # noqa: F821

#: dynamic-parameter callable — f(sim) or f(ctx, input)
SimCallable = Callable[..., Any]


@runtime_checkable
class SignatureProvider(Protocol):
    def signature(self) -> tuple: ...


def get_signature_safe(obj: Any) -> tuple:
    """Structural signature of any object, never raising
    (reference ``_type.py:119``)."""
    if isinstance(obj, SignatureProvider):
        try:
            return obj.signature()
        except Exception:
            pass
    from ..core.calculate.params import value_signature
    try:
        return ("value", value_signature(obj))
    except Exception:
        return ("opaque", type(obj).__qualname__, id(obj))
