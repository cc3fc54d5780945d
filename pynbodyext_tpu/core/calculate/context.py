"""Per-run execution state: NodeInput, RunOptions, progress sinks,
ExecutionContext.

Reference counterpart: ``core/calculate/context.py``.  Differences driven by
the functional frame model:

* ``NodeInput`` carries (root snapshot, active view, scope token).  The scope
  token is a *deterministic* tuple of the transform/filter signatures applied
  so far — replacing the reference's id()-based mutation generations
  (``context.py:678,789``) — so the same dependency under the same scope
  shares one cache entry ("CenPos evaluated once per scope", reference
  README behaviour) while different scopes never collide.
* ``FilterResult``/``TransformResult`` live with their role bases; there is
  no mutation generation counter because nothing mutates.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Dict, List, Optional, Protocol, Tuple, Union

from ...log import logger
from .cache import RuntimeCache
from .display import format_time
from .enums import ErrorPolicy, RecordPolicy
from .exceptions import CycleError
from .perf import PerfCollector
from .trace import TraceCollector

__all__ = ["NodeInput", "RunOptions", "ExecutionContext", "ProgressSink",
           "LoggerProgressSink", "TqdmProgressSink", "CompositeProgressSink",
           "NullProgressSink", "resolve_progress_sink"]


# ---------------------------------------------------------------------------
# NodeInput
# ---------------------------------------------------------------------------

class NodeInput:
    """Immutable per-evaluation view state (reference ``context.py:660-703``)."""

    __slots__ = ("sim", "active", "cache_token")

    def __init__(self, sim, active=None, cache_token: Tuple = ()):
        object.__setattr__(self, "sim", sim)
        object.__setattr__(self, "active", active if active is not None else sim)
        object.__setattr__(self, "cache_token", cache_token)

    def __setattr__(self, *_):  # pragma: no cover
        raise AttributeError("NodeInput is immutable")

    @property
    def active_sim(self):
        return self.active

    @property
    def base_snapshot(self):
        """The (possibly transformed) full snapshot under the active view."""
        return self.active.base if hasattr(self.active, "base") else self.active

    def with_transform(self, tres, sig=None) -> "NodeInput":
        """Active view moves onto the post-transform frame, keeping the mask."""
        new_base = tres.snapshot
        mask = getattr(self.active, "mask", None)
        active = new_base[mask] if mask is not None else new_base
        token = self.cache_token + (("tr", _sig_of(sig, tres)),)
        return NodeInput(self.sim, active, token)

    def with_selection(self, fres, sig=None) -> "NodeInput":
        """AND the filter mask into the active view."""
        mask = fres.mask if hasattr(fres, "mask") else fres
        active = self.active[mask]
        token = self.cache_token + (("flt", _sig_of(sig, fres)),)
        return NodeInput(self.sim, active, token)


def _sig_of(sig, result) -> Any:
    if sig is not None:
        return sig
    snap = getattr(result, "snapshot", None)
    if snap is not None and hasattr(snap, "_uid"):
        return ("uid", snap._uid)
    return ("id", id(result))


# ---------------------------------------------------------------------------
# RunOptions
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RunOptions:
    """Per-run options (reference ``context.py:504-533``)."""
    cache: bool = True
    progress: Any = None                     # None | str | ProgressSink
    perf_time: bool = False
    perf_memory: bool = False
    perf_sync: bool = False                  # block_until_ready at phase ends
    trace: bool = True
    errors: Union[ErrorPolicy, str] = ErrorPolicy.RAISE
    default_record_policy: Union[RecordPolicy, str] = RecordPolicy.SUMMARY
    cache_small_value_bytes: int = 1 << 20   # 1 MB auto-admission bound
    backend: str = "jax"
    disk_cache: Optional[str] = None         # persistent cross-run memo dir

    def __post_init__(self):
        self.errors = ErrorPolicy(self.errors)
        self.default_record_policy = RecordPolicy(self.default_record_policy)

    def merged(self, **kw) -> "RunOptions":
        d = dataclasses.asdict(self)
        d.update(kw)
        return RunOptions(**d)


# ---------------------------------------------------------------------------
# Progress sinks (reference ``context.py:186-488``)
# ---------------------------------------------------------------------------

class ProgressSink(Protocol):
    def on_run_start(self, root_label: str, total_nodes: int) -> None: ...
    def on_run_end(self, root_label: str, wall: float) -> None: ...
    def on_node_start(self, label: str, depth: int) -> None: ...
    def on_node_end(self, label: str, depth: int, wall: float,
                    cached: bool) -> None: ...
    def on_phase_start(self, label: str, phase: str, depth: int) -> None: ...
    def on_phase_end(self, label: str, phase: str, depth: int,
                     wall: float) -> None: ...
    def on_cache_event(self, kind: str, label: str) -> None: ...


class NullProgressSink:
    def on_run_start(self, *a): pass
    def on_run_end(self, *a): pass
    def on_node_start(self, *a): pass
    def on_node_end(self, *a): pass
    def on_phase_start(self, *a): pass
    def on_phase_end(self, *a): pass
    def on_cache_event(self, *a): pass


class LoggerProgressSink(NullProgressSink):
    """Tree-style log lines at run/node/phase granularity
    (reference ``context.py:213``)."""

    def __init__(self, level: str = "node"):
        self.level = level  # "run" | "node" | "phase" | "debug"
        self._count = 0
        self._total = 0

    def _emit(self, msg: str):
        logger.info(msg)

    def on_run_start(self, root_label, total_nodes):
        self._total = total_nodes
        self._count = 0
        self._emit(f"run {root_label} ({total_nodes} nodes)")

    def on_run_end(self, root_label, wall):
        self._emit(f"run {root_label} done in {format_time(wall)}")

    def on_node_start(self, label, depth):
        if self.level in ("node", "phase", "debug"):
            self._emit("  " * (depth + 1) + f"▶ {label}")

    def on_node_end(self, label, depth, wall, cached):
        self._count += 1
        if self.level in ("node", "phase", "debug"):
            tag = "cached" if cached else format_time(wall)
            self._emit("  " * (depth + 1)
                       + f"✓ {label} [{tag}] ({self._count}/{self._total})")

    def on_phase_start(self, label, phase, depth):
        if self.level in ("phase", "debug"):
            self._emit("  " * (depth + 2) + f"· {label}.{phase}")

    def on_phase_end(self, label, phase, depth, wall):
        if self.level == "debug":
            self._emit("  " * (depth + 2)
                       + f"· {label}.{phase} [{format_time(wall)}]")

    def on_cache_event(self, kind, label):
        if self.level == "debug":
            self._emit(f"    cache-{kind}: {label}")


class TqdmProgressSink(NullProgressSink):
    """tqdm bar over node completions, logger fallback when tqdm is absent
    (reference ``context.py:313``)."""

    def __init__(self, desc: str = "calc"):
        self.desc = desc
        self._bar = None
        self._fallback = None

    def on_run_start(self, root_label, total_nodes):
        try:
            from tqdm import tqdm
            self._bar = tqdm(total=total_nodes, desc=self.desc, leave=False)
        except ImportError:
            self._fallback = LoggerProgressSink("node")
            self._fallback.on_run_start(root_label, total_nodes)

    def on_node_end(self, label, depth, wall, cached):
        if self._bar is not None:
            self._bar.update(1)
            self._bar.set_postfix_str(label[:30])
        elif self._fallback:
            self._fallback.on_node_end(label, depth, wall, cached)

    def on_run_end(self, root_label, wall):
        if self._bar is not None:
            self._bar.close()
            self._bar = None
        elif self._fallback:
            self._fallback.on_run_end(root_label, wall)


class CompositeProgressSink(NullProgressSink):
    def __init__(self, *sinks):
        self.sinks = [s for s in sinks if s is not None]

    def __getattribute__(self, name):
        if name.startswith("on_"):
            sinks = object.__getattribute__(self, "sinks")

            def fanout(*a):
                for s in sinks:
                    getattr(s, name)(*a)
            return fanout
        return object.__getattribute__(self, name)


def resolve_progress_sink(spec) -> ProgressSink:
    """String resolver (reference ``context.py:569``):
    ``"run"/"node"/"phase"/"debug"`` → logger levels, ``"bar"`` /
    ``"bar:<desc>"`` → tqdm + node log, ``"bar-only"`` → tqdm alone."""
    if spec is None or spec is False:
        return NullProgressSink()
    if isinstance(spec, str):
        if spec in ("run", "node", "phase", "debug"):
            return LoggerProgressSink(spec)
        if spec == "bar-only":
            return TqdmProgressSink()
        if spec == "bar":
            return CompositeProgressSink(TqdmProgressSink(),
                                         LoggerProgressSink("run"))
        if spec.startswith("bar:"):
            return TqdmProgressSink(desc=spec[4:])
        raise ValueError(f"unknown progress spec {spec!r}")
    if spec is True:
        return LoggerProgressSink("node")
    return spec  # assume sink-like


# ---------------------------------------------------------------------------
# ExecutionContext
# ---------------------------------------------------------------------------

class ExecutionContext:
    """Per-run mutable state + dependency-evaluation API
    (reference ``context.py:707``)."""

    def __init__(self, sim, options: RunOptions, engine):
        self.sim = sim
        self.options = options
        self.engine = engine
        self.cache = RuntimeCache()
        if options.disk_cache:
            from .diskcache import DiskResultCache
            self.disk_cache = DiskResultCache(options.disk_cache)
        else:
            self.disk_cache = None
        self.trace = TraceCollector(enabled=options.trace)
        self.perf = PerfCollector(time_enabled=True,
                                  memory_enabled=options.perf_memory)
        self.progress = resolve_progress_sink(options.progress)
        self.records: List = []          # all ResultNode records, eval order
        self.named: Dict[str, Any] = {}  # name → ResultNode
        self.errors: List = []           # ErrorInfo accumulator (COLLECT)
        self._eval_stack: List[Tuple] = []
        self._record_stack: List = []    # ResultNode ancestry for children/phases
        self.depth = 0

    # -- identity -------------------------------------------------------------
    def sim_signature(self) -> Tuple:
        if hasattr(self.sim, "signature"):
            return self.sim.signature()
        return ("sim", id(self.sim))

    # -- dependency API (reference ``context.py:748-759``) ---------------------
    def evaluate(self, node, input: NodeInput, errors=None):
        """Evaluate a dependency.  ``errors`` overrides the run's error
        policy for THIS node only (used by Pipeline's COLLECT_PARTIAL)."""
        return self.engine.evaluate(node, self, input, errors_override=errors)

    def public_value(self, node, input: NodeInput):
        return self.engine.evaluate(node, self, input).public

    def raw_value(self, node, input: NodeInput):
        return self.engine.evaluate(node, self, input).raw

    # -- scopes -------------------------------------------------------------------
    @contextlib.contextmanager
    def node_scope(self, node, key: Tuple, record=None):
        if key in self._eval_stack:
            chain = " → ".join(getattr(r, "label", "?")
                               for r in self._record_stack)
            raise CycleError(
                f"dependency cycle at {node.label} (stack: {chain})")
        self._eval_stack.append(key)
        if record is not None:
            self._record_stack.append(record)
        self.progress.on_node_start(node.label, self.depth)
        self.trace.enter(node.label)
        self.depth += 1
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.depth -= 1
            self.trace.leave(node.label, dt=dt)
            self._eval_stack.pop()
            if record is not None:
                self._record_stack.pop()
            if self.options.perf_time:
                self.perf.record(node.label, "node", dt)

    @contextlib.contextmanager
    def phase(self, node, name: str):
        self.progress.on_phase_start(node.label, name, self.depth)
        self.trace.enter(node.label, phase=name)
        mem0 = self.perf.mem_snapshot()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.trace.leave(node.label, phase=name, dt=dt)
            if self._record_stack:
                from .result import PhaseRecord
                self._record_stack[-1].phases.append(PhaseRecord(name, dt))
            if self.options.perf_time:
                self.perf.record(node.label, name, dt,
                                 mem0, self.perf.mem_snapshot())
            self.progress.on_phase_end(node.label, name, self.depth, dt)

    def attach_child(self, record) -> None:
        if self._record_stack:
            self._record_stack[-1].children.append(record)

    # -- registries ----------------------------------------------------------------
    def register(self, record) -> None:
        self.records.append(record)
        name = getattr(record.node, "name", None)
        if name:
            self.named[name] = record
