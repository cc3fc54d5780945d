"""Per-run memo store (reference: ``core/calculate/cache.py``).

Per-run, NOT cross-run: keyed by (sim signature, scope token, node
signature).  Records hit/miss/store events for the trace report.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional, Tuple

__all__ = ["RuntimeCache", "ExecutionValue", "CacheEvent"]


@dataclasses.dataclass
class ExecutionValue:
    """Raw + public value pair for a completed node (ref ``cache.py:91``)."""
    raw: Any
    public: Any
    node_label: str = ""
    nbytes: int = 0


@dataclasses.dataclass
class CacheEvent:
    kind: str        # "hit" | "miss" | "store" | "skip"
    key_hash: int
    node_label: str
    t: float


class RuntimeCache:
    def __init__(self):
        self._store: Dict[Tuple, ExecutionValue] = {}
        self.events: List[CacheEvent] = []
        self.hits = 0
        self.misses = 0
        self.stores = 0

    def get(self, key: Tuple, label: str = "") -> Optional[ExecutionValue]:
        val = self._store.get(key)
        if val is not None:
            self.hits += 1
            self.events.append(CacheEvent("hit", hash(key), label, time.perf_counter()))
        else:
            self.misses += 1
            self.events.append(CacheEvent("miss", hash(key), label, time.perf_counter()))
        return val

    def put(self, key: Tuple, value: ExecutionValue):
        self._store[key] = value
        self.stores += 1
        self.events.append(CacheEvent("store", hash(key), value.node_label,
                                      time.perf_counter()))

    def skip(self, key: Tuple, label: str = ""):
        self.events.append(CacheEvent("skip", hash(key), label, time.perf_counter()))

    def __len__(self):
        return len(self._store)

    def summary(self) -> dict:
        return {"entries": len(self._store), "hits": self.hits,
                "misses": self.misses, "stores": self.stores,
                "bytes": sum(v.nbytes for v in self._store.values())}

    def report_text(self) -> str:
        s = self.summary()
        lines = [f"cache: {s['entries']} entries, {s['hits']} hits / "
                 f"{s['misses']} misses, {s['stores']} stores"]
        for ev in self.events[-50:]:
            lines.append(f"  [{ev.kind:>5}] {ev.node_label}")
        return "\n".join(lines)
