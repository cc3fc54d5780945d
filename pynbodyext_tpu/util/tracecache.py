"""Legacy standalone eval-cache + trace manager.

Reference counterpart: ``pynbodyext/util/tracecache.py`` — a
ContextVar-scoped per-top-call memo cache (``EvalCacheManager``) and a
run/phase/cache-event logger (``TraceManager``), superseded by the engine's
``ExecutionContext`` but kept for standalone (non-engine) workflows:

>>> with EvalCacheManager.scope():
...     v1 = EvalCacheManager.get_or_compute("key", expensive)
...     v2 = EvalCacheManager.get_or_compute("key", expensive)  # cached
"""

from __future__ import annotations

import contextlib
import contextvars
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

from ..log import logger

__all__ = ["EvalCacheManager", "TraceManager"]

_cache_var: contextvars.ContextVar[Optional[Dict]] = contextvars.ContextVar(
    "pnx_eval_cache", default=None)


class EvalCacheManager:
    """ContextVar-based per-scope memo cache (reference ``tracecache.py:15``)."""

    @staticmethod
    @contextlib.contextmanager
    def scope():
        token = _cache_var.set({})
        try:
            yield _cache_var.get()
        finally:
            _cache_var.reset(token)

    @staticmethod
    def active() -> bool:
        return _cache_var.get() is not None

    @staticmethod
    def get_or_compute(key: Any, fn: Callable[[], Any]) -> Any:
        cache = _cache_var.get()
        if cache is None:
            return fn()  # no scope → no caching
        if key in cache:
            return cache[key]
        value = fn()
        cache[key] = value
        return value

    @staticmethod
    def invalidate(key: Any = None) -> None:
        cache = _cache_var.get()
        if cache is None:
            return
        if key is None:
            cache.clear()
        else:
            cache.pop(key, None)


class TraceManager:
    """Standalone run/phase event logger (reference ``tracecache.py:124``)."""

    def __init__(self, name: str = "trace", log: bool = False):
        self.name = name
        self.log = log
        self.events: List[Tuple[str, str, float]] = []
        self._t0 = time.perf_counter()
        self._depth = 0

    @contextlib.contextmanager
    def phase(self, name: str):
        self.events.append(("enter", name, time.perf_counter() - self._t0))
        if self.log:
            logger.info("%s▶ %s", "  " * self._depth, name)
        self._depth += 1
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._depth -= 1
            dt = time.perf_counter() - t0
            self.events.append(("leave", name, time.perf_counter() - self._t0))
            if self.log:
                logger.info("%s◀ %s [%.1f ms]", "  " * self._depth, name,
                            dt * 1e3)

    def cache_event(self, kind: str, key: str):
        self.events.append((f"cache-{kind}", key,
                            time.perf_counter() - self._t0))

    def report(self) -> str:
        lines = [f"TraceManager({self.name}): {len(self.events)} events"]
        depth = 0
        for kind, name, t in self.events:
            if kind == "leave":
                depth -= 1
            lines.append(f"  {t * 1e3:9.2f}ms {'  ' * depth}{kind} {name}")
            if kind == "enter":
                depth += 1
        return "\n".join(lines)
