"""Declarative parameter fields for calculators.

Reference counterpart: ``core/calculate/fields.py`` (``Param`` dataclass field
specifier, ``ParamView``, ``collect_param_specs``).  Parameters declared with
:func:`Param` carry unit/static metadata used by the dynamic-param resolver
(:mod:`.params`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import MISSING
from typing import Any, Dict, Mapping, Optional

__all__ = ["Param", "ParamSpec", "ParamView", "collect_param_specs", "MISSING"]

_META_KEY = "pnx_param"


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    """Metadata for one calculator parameter."""
    name: str = ""
    units_of: Optional[str] = None   # convert to the units of this sim field
    units: Optional[str] = None      # convert to these explicit units
    static: bool = False             # never dynamically resolved (mode strings…)
    doc: str = ""

    def renamed(self, name: str) -> "ParamSpec":
        return dataclasses.replace(self, name=name)


def Param(default: Any = MISSING, *, default_factory: Any = MISSING,
          units_of: Optional[str] = None, units: Optional[str] = None,
          static: bool = False, doc: str = "") -> Any:
    """Field specifier for declarative calculators.

    ``units_of="pos"`` means: unit strings / QArrays passed for this param are
    coerced into the units of the snapshot's ``pos`` field at resolve time
    (reference ``params.py:280-312``).
    """
    spec = ParamSpec(units_of=units_of, units=units, static=static, doc=doc)
    kw: dict = {"metadata": {_META_KEY: spec}}
    if default_factory is not MISSING:
        kw["default_factory"] = default_factory
    elif default is not MISSING:
        kw["default"] = default
    return dataclasses.field(**kw)


def collect_param_specs(cls) -> Dict[str, ParamSpec]:
    """Specs for every dataclass field of ``cls`` (bare fields get defaults)."""
    specs: Dict[str, ParamSpec] = {}
    if dataclasses.is_dataclass(cls):
        for f in dataclasses.fields(cls):
            spec = f.metadata.get(_META_KEY) if f.metadata else None
            if spec is None:
                spec = ParamSpec()
            specs[f.name] = spec.renamed(f.name)
    return specs


class ParamView(Mapping):
    """Attribute + mapping access to resolved parameter values
    (reference ``fields.py:152``)."""

    __slots__ = ("_values",)

    def __init__(self, values: Dict[str, Any]):
        object.__setattr__(self, "_values", dict(values))

    def __getattr__(self, name: str):
        try:
            return self._values[name]
        except KeyError:
            raise AttributeError(name) from None

    def __getitem__(self, name: str):
        return self._values[name]

    def __iter__(self):
        return iter(self._values)

    def __len__(self):
        return len(self._values)

    def __contains__(self, name) -> bool:
        return name in self._values

    def get(self, name: str, default=None):
        return self._values.get(name, default)

    def as_dict(self) -> Dict[str, Any]:
        return dict(self._values)

    def __repr__(self):
        from .display import compact_repr
        inner = ", ".join(f"{k}={compact_repr(v, 30)}"
                          for k, v in self._values.items())
        return f"ParamView({inner})"
