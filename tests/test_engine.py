"""Engine semantics: caching, scope tokens, pipelines, error policies,
progress, trace/perf reports (mirrors reference calculate_init_test.py)."""

import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.core.calculate import (CycleError, LambdaProperty, Pipeline,
                                           PropertyBase, Scope)


def test_run_returns_result(snap):
    res = px.ParamSum("mass").run(snap)
    assert res.ok
    assert res.root.status.value in ("done",)
    assert float(res.value.value) == pytest.approx(1.38e11, rel=1e-4)


def test_shared_dependency_cached_once(snap):
    """CenPos evaluated once per scope, shared across the graph
    (reference README node-sharing behaviour)."""
    calls = {"n": 0}

    @PropertyBase.dataclass
    class Counting(PropertyBase):
        def calculate(self, sim, params):
            calls["n"] += 1
            return 1.0

    c = Counting()
    combined = (c + c) * 2 + c
    res = combined.run(snap)
    assert float(res.value) == 5.0  # (1+1)*2 + 1
    assert calls["n"] == 1  # cache collapsed all three occurrences


def test_scope_token_separates_cache_entries(snap):
    """Same node under different filters must NOT share a cache entry."""
    re = px.ParamContain("r", 0.5, "mass")
    a = re.filter(px.FamilyFilter("star"))
    b = re.filter(px.FamilyFilter("dm"))
    res = (a & b).run(snap)
    va, vb = res.value
    assert float(va.value) != pytest.approx(float(vb.value))


def test_combined_calculator(snap):
    res = (px.ParamSum("mass") & px.ParamContain("r", 0.5, "mass")).run(snap)
    assert isinstance(res.value, tuple) and len(res.value) == 2


def test_pipeline_named_outputs(snap):
    pipe = Pipeline({
        "total": px.ParamSum("mass"),
        "rhalf": px.ParamContain("r", 0.5, "mass"),
    })
    res = pipe.run(snap)
    assert set(res.value) == {"total", "rhalf"}
    assert float(res["total"].value) == pytest.approx(1.38e11, rel=1e-4)


def test_error_policy_collect(snap):
    @PropertyBase.dataclass
    class Boom(PropertyBase):
        def calculate(self, sim, params):
            raise RuntimeError("kaboom")

    with pytest.raises(RuntimeError):
        Boom().run(snap)
    res = Boom().run(snap, errors="collect")
    assert not res.ok
    assert res.value is None
    assert "kaboom" in res.errors[0].message


def test_error_policy_collect_partial(snap):
    @PropertyBase.dataclass
    class Boom(PropertyBase):
        def calculate(self, sim, params):
            raise RuntimeError("kaboom")

    pipe = Pipeline({"good": px.ParamSum("mass"), "bad": Boom()})
    res = pipe.run(snap, errors="collect_partial")
    assert res.value["bad"] is None
    assert float(res.value["good"].value) == pytest.approx(1.38e11, rel=1e-4)


def test_cycle_detection(snap):
    a = px.ParamSum("mass")
    sphere = px.Sphere(1.0)
    # build a self-referential dynamic param → cycle
    sphere_cyclic = px.Sphere(px.ParamSum("mass").filter(sphere))
    object.__setattr__  # noqa
    # direct cycle: a node whose param is itself
    s = px.Sphere(1.0)
    s.radius = px.ParamSum("mass").filter(s)
    with pytest.raises(CycleError):
        px.ParamSum("mass").filter(s).run(snap)


def test_lambda_property(snap):
    node = LambdaProperty(lambda sim: len(sim))
    assert node(snap) == len(snap)


def test_scope_builder(snap):
    sc = Scope(filter=px.FamilyFilter("star"),
               transform=px.ShiftPosTo("ssc"))
    bound = sc.apply(px.ParamContain("r", 0.5, "mass"))
    v = float(bound(snap).value)
    assert 0 < v < 30  # stellar half-mass radius of the centered disk


def test_named_and_keep(snap):
    re = px.ParamContain("r", 0.5, "mass").named("re").keep()
    res = (2 * re).run(snap)
    assert "re" in res.named
    assert res.named["re"].public is not None  # keep() retains the value


def test_record_policy_drops_values(snap):
    re = px.ParamContain("r", 0.5, "mass")
    res = (2 * re).run(snap)  # default SUMMARY policy
    # unnamed dependency records keep the summary but drop the payload
    dep = [n for n in res.nodes if n.label == "ParamContain"][0]
    assert dep.public is None
    assert dep.summary is not None
    # named nodes keep their values
    res2 = (2 * re.named("re")).run(snap)
    assert res2.named["re"].public is not None


def test_perf_and_trace_reports(snap):
    res = px.ParamSum("mass").run(snap, perf_time=True)
    assert "perf" in res.reports
    assert "trace_timeline" in res.reports
    assert "calculate" in res.reports["perf"]
    assert res.pipeline_report()


def test_progress_string_resolution(snap):
    for spec in (None, "run", "node", "phase", "bar-only"):
        res = px.ParamSum("mass").run(snap, progress=spec)
        assert res.ok
    with pytest.raises(ValueError):
        px.ParamSum("mass").run(snap, progress="bogus")


def test_signature_stability(snap):
    a = px.ParamContain("r", 0.5, "mass")
    b = px.ParamContain("r", 0.5, "mass")
    assert a.signature() == b.signature()
    assert a.signature_hash() == b.signature_hash()
    c = px.ParamContain("r", 0.6, "mass")
    assert a.signature() != c.signature()
    # bound scope changes the signature
    assert a.filter(px.FamilyFilter("star")).signature() != a.signature()


def test_format_tree(snap):
    calc = px.KappaRot().transform(px.ShiftPosTo("ssc")).filter(
        px.Sphere("30 kpc"))
    tree = calc.format_tree()
    assert "KappaRot" in tree and "ShiftPosTo" in tree and "Sphere" in tree


def test_dynamic_callable_param(snap):
    node = px.Sphere(lambda sim: 10.0)
    m1 = node.where(snap)
    m2 = px.Sphere(10.0).where(snap)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
