"""Per-phase performance collection (reference: ``core/calculate/perf.py``).

Wall time + optional tracemalloc delta/peak per phase, aggregated into a
summary table.  TPU addition: phase timing can synchronize on device work
(``block_until_ready``) so phases reflect real compute, not async dispatch.
"""

from __future__ import annotations

import dataclasses
import tracemalloc
from typing import Dict, List, Tuple

from .display import format_mem, format_time

__all__ = ["PerfCollector", "PerfSummary", "PerfFormatter"]


@dataclasses.dataclass
class _PhaseEntry:
    node_label: str
    phase: str
    wall: float
    mem_delta: int = 0
    mem_peak: int = 0


@dataclasses.dataclass
class PerfSummary:
    total_wall: float
    by_phase: Dict[str, float]
    by_node: Dict[str, float]
    entries: List[_PhaseEntry]

    def as_dict(self) -> dict:
        return {"total_wall": self.total_wall, "by_phase": self.by_phase,
                "by_node": self.by_node}


class PerfCollector:
    def __init__(self, time_enabled: bool = True, memory_enabled: bool = False):
        self.time_enabled = time_enabled
        self.memory_enabled = memory_enabled
        self.entries: List[_PhaseEntry] = []
        self._mem_started_here = False
        if memory_enabled and not tracemalloc.is_tracing():
            tracemalloc.start()
            self._mem_started_here = True

    def mem_snapshot(self) -> Tuple[int, int]:
        if not self.memory_enabled:
            return (0, 0)
        return tracemalloc.get_traced_memory()

    def record(self, node_label: str, phase: str, wall: float,
               mem_before: Tuple[int, int] = (0, 0),
               mem_after: Tuple[int, int] = (0, 0)):
        self.entries.append(_PhaseEntry(
            node_label, phase, wall,
            mem_delta=mem_after[0] - mem_before[0],
            mem_peak=mem_after[1]))

    def close(self):
        if self._mem_started_here and tracemalloc.is_tracing():
            tracemalloc.stop()

    def summary(self) -> PerfSummary:
        by_phase: Dict[str, float] = {}
        by_node: Dict[str, float] = {}
        for e in self.entries:
            by_phase[e.phase] = by_phase.get(e.phase, 0.0) + e.wall
            by_node[e.node_label] = by_node.get(e.node_label, 0.0) + e.wall
        # nested phases double-count by design (matches reference table)
        total = sum(e.wall for e in self.entries
                    if e.phase == "node")
        return PerfSummary(total, by_phase, by_node, list(self.entries))


class PerfFormatter:
    """Text table (reference ``perf.py:216``)."""

    @staticmethod
    def table(summary: PerfSummary, memory: bool = False) -> str:
        lines = [f"{'node':<40} {'phase':<16} {'wall':>10}"
                 + (f" {'mem Δ':>10} {'peak':>10}" if memory else "")]
        lines.append("-" * len(lines[0]))
        for e in summary.entries:
            row = f"{e.node_label[:39]:<40} {e.phase:<16} {format_time(e.wall):>10}"
            if memory:
                row += f" {format_mem(e.mem_delta):>10} {format_mem(e.mem_peak):>10}"
            lines.append(row)
        lines.append("-" * len(lines[0]))
        lines.append(f"total (node phases): {format_time(summary.total_wall)}")
        return "\n".join(lines)
