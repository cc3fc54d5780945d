"""Single-run DAG evaluator.

Reference counterpart: ``core/calculate/engine.py`` (EvalEngine): cycle
detection via the evaluation stack, cache key = (sim signature, scope token,
node signature), cache-hit short-circuit, execute→public lifecycle, error
capture per ErrorPolicy, size-based cache admission, result assembly.
"""

from __future__ import annotations

import time
from typing import Optional

from .cache import ExecutionValue
from .context import ExecutionContext, NodeInput, RunOptions
from .display import summarize_value
from .enums import CachePolicy, ErrorPolicy, NodeStatus, RecordPolicy
from .exceptions import CycleError
from .perf import PerfFormatter
from .result import ErrorInfo, ProvenanceInfo, Result, ResultNode

__all__ = ["EvalEngine"]


class EvalEngine:
    def __init__(self, options: Optional[RunOptions] = None):
        self.options = options if options is not None else RunOptions()

    # -- entry (reference ``engine.py:130``) --------------------------------
    def run(self, root, sim) -> Result:
        ctx = ExecutionContext(sim, self.options, self)
        total = self._estimate_total_nodes(root)
        ctx.progress.on_run_start(root.label, total)
        t0 = time.perf_counter()
        started = time.time()
        record: Optional[ResultNode] = None
        try:
            record = self.evaluate(root, ctx, NodeInput(sim))
        except Exception:
            ctx.perf.close()
            ctx.progress.on_run_end(root.label, time.perf_counter() - t0)
            raise
        wall = time.perf_counter() - t0
        ctx.progress.on_run_end(root.label, wall)
        ctx.perf.close()
        return self._assemble_result(ctx, root, record, started, wall)

    # -- node evaluation (reference ``engine.py:174-440``) ---------------------
    def evaluate(self, node, ctx: ExecutionContext, input: NodeInput,
                 errors_override: Optional[ErrorPolicy] = None
                 ) -> ResultNode:
        key = (ctx.sim_signature(), input.cache_token, node.signature())
        policy = getattr(node, "_cache_override", None) or node.cache_policy
        cache_on = (ctx.options.cache and node.cacheable
                    and policy != CachePolicy.NONE)

        if cache_on:
            hit = ctx.cache.get(key, node.label)
            if hit is not None:
                ctx.trace.cache_event("hit", node.label)
                ctx.progress.on_cache_event("hit", node.label)
                rec = ResultNode(node, node.label, node.node_kind)
                rec.raw, rec.public = hit.raw, hit.public
                rec.status = NodeStatus.CACHED
                rec.cached = True
                rec.signature_hash = node.signature_hash()
                ctx.attach_child(rec)
                ctx.register(rec)
                ctx.progress.on_node_end(node.label, ctx.depth, 0.0, True)
                return rec
            ctx.trace.cache_event("miss", node.label)

        # persistent cross-run memo (signature-stable nodes only)
        disk_path = None
        if cache_on and ctx.disk_cache is not None:
            disk_path = ctx.disk_cache.lookup_key(ctx.sim, input.cache_token,
                                                  node)
            if disk_path is not None:
                got = ctx.disk_cache.get(disk_path)
                if got is not None:
                    raw, public = got
                    rec = ResultNode(node, node.label, node.node_kind)
                    rec.raw, rec.public = raw, public
                    rec.status = NodeStatus.CACHED
                    rec.cached = True
                    rec.signature_hash = node.signature_hash()
                    ctx.attach_child(rec)
                    ctx.register(rec)
                    ctx.cache.put(key, ExecutionValue(raw, public,
                                                      node.label, 0))
                    ctx.trace.cache_event("disk-hit", node.label)
                    ctx.progress.on_node_end(node.label, ctx.depth, 0.0, True)
                    return rec

        rec = ResultNode(node, node.label, node.node_kind)
        rec.signature_hash = node.signature_hash()
        ctx.attach_child(rec)
        t0 = time.perf_counter()
        with ctx.node_scope(node, key, rec):
            rec.status = NodeStatus.RUNNING
            try:
                raw = node.execute(ctx, input)
                public = node.public_value_from_raw(raw)
            except CycleError:
                raise
            except Exception as exc:
                rec.status = NodeStatus.ERROR
                rec.error = ErrorInfo(type(exc).__name__, str(exc),
                                      phase=_current_phase(rec),
                                      node_label=node.label)
                ctx.errors.append(rec.error)
                ctx.register(rec)
                policy_now = (ctx.options.errors if errors_override is None
                              else errors_override)
                if policy_now == ErrorPolicy.RAISE:
                    raise
                rec.wall = time.perf_counter() - t0
                ctx.progress.on_node_end(node.label, ctx.depth, rec.wall, False)
                return rec
        rec.raw, rec.public = raw, public
        rec.status = NodeStatus.DONE
        rec.wall = time.perf_counter() - t0
        rec.summary = summarize_value(public)
        if cache_on and self._should_store(policy, rec):
            ctx.cache.put(key, ExecutionValue(raw, public, node.label,
                                              rec.summary.get("bytes", 0)))
            ctx.trace.cache_event("store", node.label)
        if disk_path is not None:
            if ctx.disk_cache.put(disk_path, raw, public):
                ctx.trace.cache_event("disk-store", node.label)
        ctx.register(rec)
        ctx.progress.on_node_end(node.label, ctx.depth, rec.wall, False)
        return rec

    # -- cache admission (reference ``engine.py:516,537``) ----------------------
    def _should_store(self, policy: CachePolicy, rec: ResultNode) -> bool:
        if policy == CachePolicy.FULL:
            return True
        nbytes = rec.summary.get("bytes", 0) if rec.summary else 0
        if policy in (CachePolicy.AUTO, CachePolicy.SMALL_ONLY):
            return nbytes <= self.options.cache_small_value_bytes
        return False

    # -- static size estimate (reference ``engine.py:271``) ----------------------
    def _estimate_total_nodes(self, root) -> int:
        seen = set()

        def walk(n):
            try:
                sig = n.signature()
            except Exception:
                sig = id(n)
            if sig in seen:
                return 0
            seen.add(sig)
            count = 1
            try:
                deps = n.dependencies()
            except Exception:
                deps = []
            for d in deps:
                count += walk(d)
            return count
        return walk(root)

    # -- assembly (reference ``engine.py:442-514``) --------------------------------
    def _assemble_result(self, ctx: ExecutionContext, root, record,
                         started: float, wall: float) -> Result:
        reports = {}
        if self.options.perf_time:
            reports["perf"] = PerfFormatter.table(
                ctx.perf.summary(), memory=self.options.perf_memory)
        reports["cache"] = ctx.cache.report_text()
        if self.options.trace:
            reports["trace_timeline"] = ctx.trace.render_timeline()
            reports["trace_tree"] = ctx.trace.render_tree()
        diagnostics = {
            "cache": ctx.cache.summary(),
            "n_nodes": len(ctx.records),
            "n_errors": len(ctx.errors),
            "named": {k: (v.summary or {}) for k, v in ctx.named.items()},
        }
        if ctx.disk_cache is not None:
            diagnostics["disk_cache"] = ctx.disk_cache.summary()
        if self.options.perf_time:
            diagnostics["perf"] = ctx.perf.summary().as_dict()
        prov = ProvenanceInfo(
            root_signature_hash=root.signature_hash(),
            sim_repr=repr(ctx.sim)[:120],
            started_at=started, wall=wall,
            backend=self.options.backend)
        value = record.public if record is not None else None
        self._apply_record_policies(ctx, record)
        return Result(value=value, root=record, nodes=ctx.records,
                      named=dict(ctx.named), reports=reports,
                      diagnostics=diagnostics, errors=list(ctx.errors),
                      provenance=prov, options=self.options)

    def _apply_record_policies(self, ctx: ExecutionContext, root_record):
        default = self.options.default_record_policy
        for rec in ctx.records:
            if rec is root_record:
                continue  # the root's value IS the result
            node = rec.node
            policy = getattr(node, "_record_override", None) \
                or node.record_policy or default
            if policy == RecordPolicy.FULL:
                continue
            if policy == RecordPolicy.ERROR_ONLY \
                    and rec.status == NodeStatus.ERROR:
                continue
            # NONE / SUMMARY / ERROR_ONLY-on-success: drop heavy payloads,
            # keep the summary (NONE drops that too).  Explicitly named or
            # kept nodes retain their values — naming implies the user reads
            # them from Result.named.
            if rec.node is not None and (getattr(rec.node, "_keep", False)
                                         or getattr(rec.node, "name", None)):
                continue
            rec.raw = None
            rec.public = None
            if policy == RecordPolicy.NONE:
                rec.summary = None


def _current_phase(rec: ResultNode) -> Optional[str]:
    return rec.phases[-1].name if rec.phases else None
