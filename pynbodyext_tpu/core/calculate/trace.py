"""Structured trace collection (reference: ``core/calculate/trace.py``).

Phase enter/leave + cache events with depth; renders a timeline and a node
tree into ``result.reports``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

from .display import format_time

__all__ = ["TraceCollector", "TraceEvent"]


@dataclasses.dataclass
class TraceEvent:
    kind: str            # "enter" | "leave" | "cache"
    node_label: str
    phase: Optional[str]
    depth: int
    t: float
    dt: Optional[float] = None
    detail: str = ""


class TraceCollector:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.events: List[TraceEvent] = []
        self.depth = 0
        self._t0 = time.perf_counter()

    def enter(self, node_label: str, phase: Optional[str] = None):
        if not self.enabled:
            return
        self.events.append(TraceEvent("enter", node_label, phase, self.depth,
                                      time.perf_counter() - self._t0))
        self.depth += 1

    def leave(self, node_label: str, phase: Optional[str] = None,
              dt: Optional[float] = None):
        if not self.enabled:
            return
        self.depth = max(0, self.depth - 1)
        self.events.append(TraceEvent("leave", node_label, phase, self.depth,
                                      time.perf_counter() - self._t0, dt=dt))

    def cache_event(self, kind: str, node_label: str):
        if not self.enabled:
            return
        self.events.append(TraceEvent("cache", node_label, None, self.depth,
                                      time.perf_counter() - self._t0,
                                      detail=kind))

    # -- renderers (reference ``trace.py:160,172``) -------------------------
    def render_timeline(self) -> str:
        lines = []
        for ev in self.events:
            pad = "  " * ev.depth
            if ev.kind == "enter":
                tag = f"{ev.node_label}" + (f".{ev.phase}" if ev.phase else "")
                lines.append(f"{ev.t * 1e3:9.2f}ms {pad}▶ {tag}")
            elif ev.kind == "leave" and ev.dt is not None:
                tag = f"{ev.node_label}" + (f".{ev.phase}" if ev.phase else "")
                lines.append(f"{ev.t * 1e3:9.2f}ms {pad}◀ {tag} "
                             f"[{format_time(ev.dt)}]")
            elif ev.kind == "cache":
                lines.append(f"{ev.t * 1e3:9.2f}ms {pad}· cache-{ev.detail} "
                             f"{ev.node_label}")
        return "\n".join(lines)

    def render_tree(self) -> str:
        lines: List[str] = []
        for ev in self.events:
            if ev.kind == "enter" and ev.phase is None:
                lines.append("  " * ev.depth + ev.node_label)
        return "\n".join(lines)
