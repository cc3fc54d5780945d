"""Optional-dependency detection (reference: ``pynbodyext/util/deps.py``)."""

from __future__ import annotations

import importlib.util

__all__ = ["module_available", "TPU_AVAILABLE", "H5PY_AVAILABLE",
           "MATPLOTLIB_AVAILABLE", "NATIVE_TREE_AVAILABLE"]


def module_available(name: str) -> bool:
    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ValueError):
        return False


H5PY_AVAILABLE = module_available("h5py")
MATPLOTLIB_AVAILABLE = module_available("matplotlib")


def _tpu_available() -> bool:
    try:
        import jax
        return any(d.platform not in ("cpu",) for d in jax.devices())
    except Exception:
        return False


def _native_tree_available() -> bool:
    try:
        from ..gravity._native import lib  # noqa: F401
        return lib is not None
    except Exception:
        return False


def __getattr__(name: str):
    # lazy: probing devices initializes the backend (slow over TPU tunnels)
    if name == "TPU_AVAILABLE":
        return _tpu_available()
    if name == "NATIVE_TREE_AVAILABLE":
        return _native_tree_available()
    raise AttributeError(name)
