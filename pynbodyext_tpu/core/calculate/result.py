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
from .enums import NodeStatus

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

    def _repr_html_(self):
        """Fact card (reference ``ResultRepr.result_node_html``)."""
        from .display import html_card, html_table
        rows = [("label", self.label), ("kind", self.kind),
                ("status", self.status.value), ("cached", self.cached),
                ("wall", format_time(self.wall)),
                ("children", len(self.children)),
                ("phases", len(self.phases)),
                ("value", compact_repr(self.public, 80))]
        if self.error is not None:
            rows.append(("error", str(self.error)))
        return html_card("ResultNode", html_table(rows))


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

    # -- queries (reference ``result.py:480-560`` ResultQuery) ----------------
    def walk(self) -> Iterator[ResultNode]:
        if self.root is not None:
            yield from self.root.walk()

    def find_by_kind(self, kind: str) -> List[ResultNode]:
        return [n for n in self.nodes if n.kind == kind]

    def find_by_label(self, label: str) -> List[ResultNode]:
        return [n for n in self.nodes if n.label == label]

    def find_error_nodes(self) -> List[ResultNode]:
        return [n for n in self.nodes if n.error is not None]

    def resolve_node(self, node) -> ResultNode:
        """Accept a ResultNode, a name, or a label (reference
        ``ResultQuery.resolve_node``)."""
        if isinstance(node, ResultNode):
            return node
        if node in self.named:
            return self.named[node]
        hits = self.find_by_label(node)
        if hits:
            return hits[0]
        raise KeyError(node)

    def children_of(self, node) -> List[ResultNode]:
        return list(self.resolve_node(node).children)

    def phases_of(self, node) -> List[PhaseRecord]:
        return list(self.resolve_node(node).phases)

    def describe_node(self, node) -> str:
        n = self.resolve_node(node)
        lines = [f"label: {n.label}",
                 f"kind: {n.kind}",
                 f"status: {n.status.value}",
                 f"cached: {n.cached}",
                 f"wall: {format_time(n.wall)}",
                 f"children: {len(n.children)}",
                 f"phases: {len(n.phases)}",
                 f"signature: {n.signature_hash[:16]}"]
        if n.summary:
            lines.append(f"value: {n.summary.get('repr', '')}")
            if "units" in n.summary:
                lines.append(f"units: {n.summary['units']}")
        if n.error is not None:
            lines.append(f"error: {n.error}")
        return "\n".join(lines)

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

    def cache_section(self) -> str:
        return self.reports.get("cache", "(no cache report)")

    def pipeline_report(self, include_perf: bool = True,
                        include_trace: bool = False,
                        include_cache: bool = False,
                        include_errors: bool = True) -> str:
        """Multi-section text report (reference ``result.py:768``)."""
        sections = ["Summary", self.summary(),
                    "Pipeline", self.node_tree()]
        if include_perf and "perf" in self.reports:
            sections += ["Performance", self.reports["perf"]]
        if include_trace and "trace_timeline" in self.reports:
            sections += ["Trace Timeline", self.reports["trace_timeline"]]
        if include_cache and "cache" in self.reports:
            sections += ["Cache", self.reports["cache"]]
        err_nodes = self.find_error_nodes()
        if include_errors and (self.errors or err_nodes):
            block: List[str] = []
            if err_nodes:
                block.append("nodes:")
                block += [f"- {n.label}"
                          + (f" phase={n.error.phase}" if n.error.phase
                             else "") for n in err_nodes]
            if self.errors:
                if block:
                    block.append("")
                block.append("messages:")
                block += [f"- {e}" for e in self.errors]
            sections += ["Errors", "\n".join(block)]
        return "\n\n".join(s for s in sections if s)

    def __repr__(self):
        return (f"<Result value={compact_repr(self.value, 40)} "
                f"nodes={len(self.nodes)} errors={len(self.errors)}>")

    def _repr_html_(self):
        """Card with a fact table, named-value table, and node tree
        (reference ``ResultRepr.result_html``, ``result.py:652-678``)."""
        from .display import html_card, html_pre, html_table
        rows = [("root", self.root.label if self.root else "-"),
                ("value", compact_repr(self.value, 60)),
                ("ok", self.ok),
                ("nodes", len(self.nodes)),
                ("errors", len(self.errors)),
                ("wall", format_time(self.provenance.wall))]
        body = html_table(rows)
        if self.named:
            body += "<div style='margin-top:4px'><b>Named values</b></div>"
            body += html_table(
                [(k, compact_repr(v.public, 80),
                  "cached" if v.cached else format_time(v.wall))
                 for k, v in self.named.items()],
                header=("name", "value", "time"))
        body += html_pre(self.node_tree())
        return html_card("Result", body)
