"""Run output model: Result, ResultNode, query + report rendering.

Reference counterpart: ``core/calculate/result.py`` (Result, ResultNode,
ValueSummary, PhaseRecord, ErrorInfo, ProvenanceInfo, ResultQuery,
ResultRepr).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Iterator, List, Optional

from .display import compact_repr, format_time
from .enums import NodeStatus, RecordPolicy

__all__ = ["Result", "ResultNode", "PhaseRecord", "ErrorInfo",
           "ValueSummary", "ProvenanceInfo"]


@dataclasses.dataclass
class PhaseRecord:
    name: str
    wall: float
    mem_delta: int = 0


@dataclasses.dataclass
class ErrorInfo:
    type: str
    message: str
    phase: Optional[str] = None
    node_label: str = ""

    def __str__(self):
        where = f" [{self.phase}]" if self.phase else ""
        return f"{self.type}: {self.message}{where} @ {self.node_label}"


ValueSummary = dict  # machine-readable summary (display.summarize_value)


@dataclasses.dataclass
class ProvenanceInfo:
    root_signature_hash: str = ""
    sim_repr: str = ""
    started_at: float = 0.0
    wall: float = 0.0
    backend: str = "jax"


class ResultNode:
    """Per-node record of one evaluation (reference ``result.py:170``)."""

    __slots__ = ("node", "label", "kind", "status", "raw", "public",
                 "summary", "phases", "error", "cached", "children",
                 "signature_hash", "wall")

    def __init__(self, node, label: str, kind: str):
        self.node = node
        self.label = label
        self.kind = kind
        self.status = NodeStatus.PENDING
        self.raw: Any = None
        self.public: Any = None
        self.summary: Optional[ValueSummary] = None
        self.phases: List[PhaseRecord] = []
        self.error: Optional[ErrorInfo] = None
        self.cached = False
        self.children: List["ResultNode"] = []
        self.signature_hash = ""
        self.wall = 0.0

    @property
    def value(self):
        return self.public

    def walk(self) -> Iterator["ResultNode"]:
        yield self
        for c in self.children:
            yield from c.walk()

    def __repr__(self):
        flag = " cached" if self.cached else ""
        return (f"<ResultNode {self.label} [{self.status.value}{flag}] "
                f"{compact_repr(self.public, 30)}>")


class Result:
    """Rich run output (reference ``result.py:242``): ``.value`` plus node
    records, named values, reports and diagnostics."""

    def __init__(self, value: Any, root: Optional[ResultNode],
                 nodes: List[ResultNode], named: Dict[str, ResultNode],
                 reports: Dict[str, str], diagnostics: Dict[str, Any],
                 errors: List[ErrorInfo], provenance: ProvenanceInfo,
                 options=None):
        self.value = value
        self.root = root
        self.nodes = nodes
        self.named = named
        self.reports = reports
        self.diagnostics = diagnostics
        self.errors = errors
        self.provenance = provenance
        self.options = options

    # -- queries (reference ``result.py:480``) -------------------------------
    def walk(self) -> Iterator[ResultNode]:
        if self.root is not None:
            yield from self.root.walk()

    def find_by_kind(self, kind: str) -> List[ResultNode]:
        return [n for n in self.nodes if n.kind == kind]

    def find_by_label(self, label: str) -> List[ResultNode]:
        return [n for n in self.nodes if n.label == label]

    def __getitem__(self, name: str):
        """Named-value access: ``result["re"]`` → public value."""
        return self.named[name].public

    @property
    def named_values(self) -> Dict[str, Any]:
        return {k: v.public for k, v in self.named.items()}

    @property
    def ok(self) -> bool:
        return not self.errors

    # -- renderers (reference ``result.py:600,768``) ----------------------------
    def node_tree(self) -> str:
        lines: List[str] = []

        def rec(n: ResultNode, depth: int):
            tag = "cached" if n.cached else format_time(n.wall)
            lines.append("  " * depth
                         + f"{n.label} [{n.status.value}, {tag}] "
                         + compact_repr(n.public, 40))
            for c in n.children:
                rec(c, depth + 1)
        if self.root is not None:
            rec(self.root, 0)
        return "\n".join(lines)

    def perf_table(self) -> str:
        return self.reports.get("perf", "(perf not enabled — pass "
                                        "perf_time=True)")

    def summary(self) -> str:
        lines = [f"Result: {compact_repr(self.value, 60)}",
                 f"  nodes: {len(self.nodes)}  "
                 f"errors: {len(self.errors)}  "
                 f"wall: {format_time(self.provenance.wall)}"]
        if self.named:
            lines.append("  named: "
                         + ", ".join(f"{k}={compact_repr(v.public, 25)}"
                                     for k, v in self.named.items()))
        for e in self.errors:
            lines.append(f"  ERROR {e}")
        return "\n".join(lines)

    def pipeline_report(self) -> str:
        sections = [self.summary(), "", "── node tree ──", self.node_tree()]
        if "perf" in self.reports:
            sections += ["", "── perf ──", self.reports["perf"]]
        if "cache" in self.reports:
            sections += ["", "── cache ──", self.reports["cache"]]
        return "\n".join(sections)

    def __repr__(self):
        return (f"<Result value={compact_repr(self.value, 40)} "
                f"nodes={len(self.nodes)} errors={len(self.errors)}>")

    def _repr_html_(self):
        from .display import html_pre
        return ("<b>Result</b>" + html_pre(self.summary())
                + html_pre(self.node_tree()))
