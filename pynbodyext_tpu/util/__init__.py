"""Cross-cutting utilities (reference: ``pynbodyext/util``)."""

from ._type import (FilterLike, SimCallable, SnapArray, UnitLike,
                    get_signature_safe)
from .deps import H5PY_AVAILABLE, MATPLOTLIB_AVAILABLE, module_available
from .perf import PerfStats, ProfileInfo, profile_block


def __getattr__(name: str):
    if name in ("TPU_AVAILABLE", "NATIVE_TREE_AVAILABLE"):
        from . import deps
        return getattr(deps, name)
    raise AttributeError(name)

__all__ = [
    "profile_block", "ProfileInfo", "PerfStats",
    "module_available", "TPU_AVAILABLE", "H5PY_AVAILABLE",
    "MATPLOTLIB_AVAILABLE", "NATIVE_TREE_AVAILABLE",
    "UnitLike", "SnapArray", "FilterLike", "SimCallable",
    "get_signature_safe",
]
