"""Standalone profiling helpers usable outside the calculator engine.

Reference counterpart: ``pynbodyext/util/perf.py`` (``profile_block`` context
manager, ``ProfileInfo``, multi-step ``PerfStats`` with ``.step(name)`` and a
text report).  TPU note: wall time of device work is only meaningful after a
sync; pass ``sync=True`` (default) to block on all device work at step
boundaries via ``jax.block_until_ready``-on-live-arrays semantics
(best-effort: a barrier op round-trip).
"""

from __future__ import annotations

import contextlib
import time
import tracemalloc
from typing import List, Optional

from ..core.calculate.display import format_mem, format_time

__all__ = ["ProfileInfo", "profile_block", "PerfStats"]


def _get_rss() -> Optional[int]:
    try:
        import psutil
        return psutil.Process().memory_info().rss
    except Exception:
        return None


def _device_sync():
    """Best-effort device barrier (cheap scalar round trip)."""
    try:
        import jax.numpy as jnp
        float(jnp.zeros(()) + 0.0)
    except Exception:
        pass


class ProfileInfo:
    """Timing + memory statistics of one profiled block
    (reference ``util/perf.py:111``)."""

    def __init__(self):
        self.time: Optional[float] = None
        self.memory_start: Optional[int] = None
        self.memory_end: Optional[int] = None
        self.memory_peak: Optional[int] = None
        self.rss_start: Optional[int] = None
        self.rss_end: Optional[int] = None

    @property
    def memory_used(self) -> Optional[int]:
        if self.memory_end is not None and self.memory_start is not None:
            return self.memory_end - self.memory_start
        return None

    @property
    def max_memory_used(self) -> Optional[int]:
        if self.memory_peak is not None and self.memory_start is not None:
            return self.memory_peak - self.memory_start
        return None

    @property
    def rss_used(self) -> Optional[int]:
        if self.rss_start is not None and self.rss_end is not None:
            return self.rss_end - self.rss_start
        return None

    def __repr__(self):
        bits = []
        if self.time is not None:
            bits.append(f"time={format_time(self.time)}")
        if self.max_memory_used is not None:
            bits.append(f"peak={format_mem(self.max_memory_used)}")
        if self.rss_used is not None:
            bits.append(f"rss={format_mem(self.rss_used)}")
        return f"<ProfileInfo {' '.join(bits) or 'empty'}>"


@contextlib.contextmanager
def profile_block(measure_time: bool = True, measure_memory: bool = True,
                  tracemalloc_nframe: int = 1, sync: bool = True):
    """Profile a code block (reference ``util/perf.py:200``).

    >>> with profile_block() as info:
    ...     do_work()
    >>> info.time, info.memory_peak
    """
    info = ProfileInfo()
    started_tm = False
    if measure_memory:
        if not tracemalloc.is_tracing():
            tracemalloc.start(tracemalloc_nframe)
            started_tm = True
        info.memory_start, _ = tracemalloc.get_traced_memory()
        tracemalloc.reset_peak()
        info.rss_start = _get_rss()
    if measure_time and sync:
        _device_sync()
    t0 = time.perf_counter()
    try:
        yield info
    finally:
        if measure_time:
            if sync:
                _device_sync()
            info.time = time.perf_counter() - t0
        if measure_memory:
            info.memory_end, info.memory_peak = \
                tracemalloc.get_traced_memory()
            if started_tm:
                tracemalloc.stop()
            info.rss_end = _get_rss()


class PerfStats:
    """Multi-step profiler (reference ``util/perf.py:251``).

    >>> with PerfStats() as perf:
    ...     with perf.step("load"):
    ...         load()
    ...     with perf.step("compute"):
    ...         compute()
    >>> print(perf.report())
    """

    def __init__(self, time: bool = True, memory: bool = True,
                 tracemalloc_nframe: int = 1, sync: bool = True):
        self.time_enabled = time
        self.memory_enabled = memory
        self.tracemalloc_nframe = tracemalloc_nframe
        self.sync = sync
        self.reset()

    def reset(self):
        self.steps: List = []  # (name, ProfileInfo)
        self._total_time: Optional[float] = None
        self._t0: Optional[float] = None
        self._started_tm = False

    def __enter__(self):
        if self.memory_enabled and not tracemalloc.is_tracing():
            tracemalloc.start(self.tracemalloc_nframe)
            self._started_tm = True
        if self.time_enabled and self.sync:
            _device_sync()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.time_enabled:
            if self.sync:
                _device_sync()
            self._total_time = time.perf_counter() - self._t0
        if self._started_tm and tracemalloc.is_tracing():
            tracemalloc.stop()
        return False

    @contextlib.contextmanager
    def step(self, name: str):
        with profile_block(self.time_enabled, self.memory_enabled,
                           self.tracemalloc_nframe, sync=self.sync) as info:
            yield info
        self.steps.append((name, info))

    @property
    def total_time(self) -> Optional[float]:
        if self._total_time is not None:
            return self._total_time
        if self._t0 is not None:
            return time.perf_counter() - self._t0
        return None

    def report(self, logger=None, title: str = "") -> str:
        lines = [title or "PerfStats report"]
        w = max([len(n) for n, _ in self.steps], default=4) + 2
        for name, info in self.steps:
            row = f"  {name:<{w}}"
            if info.time is not None:
                row += f" {format_time(info.time):>10}"
            if info.max_memory_used is not None:
                row += f" peak {format_mem(info.max_memory_used):>10}"
            lines.append(row)
        if self.total_time is not None:
            lines.append(f"  {'total':<{w}} {format_time(self.total_time):>10}")
        out = "\n".join(lines)
        if logger is not None:
            logger.info(out)
        return out
