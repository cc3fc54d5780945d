"""End-to-end BASELINE.json configs on the test galaxy (the north-star
pipelines, CPU-sized)."""

import numpy as np
import pytest

import pynbodyext_tpu as px


def _kappa_chain():
    sel = px.Sphere("30 kpc") & px.FamilyFilter("star")
    return (px.WrapBox(convention="minirange")
            .then(px.ShiftPosTo("ssc"))
            .then(px.ShiftVelTo("com").measure_with(sel))
            .then(px.AlignVec(px.AngMomVec()).measure_with(sel))), sel


def test_config1_sums_and_contain(snap):
    """ParamSum stellar mass + half-mass radius (BASELINE config 1)."""
    stars = px.FamilyFilter("star")
    m_star = px.ParamSum("mass").filter(stars)(snap)
    assert float(m_star.value) == pytest.approx(5_000 * 2e6, rel=1e-4)
    chain = px.WrapBox(convention="minirange").then(px.ShiftPosTo("ssc"))
    rhalf = px.ParamContain("r", 0.5, "mass").transform(chain).filter(stars)(snap)
    # generator draws r ~ Exp(3 kpc) directly → half-mass radius ≈ 3·ln2
    assert float(rhalf.value) == pytest.approx(3.0 * np.log(2.0), rel=0.05)


def test_config3_dynamic_dependency_graph(snap):
    """ShiftVelTo('com').filter(Sphere(0.5*re)) with dynamic re
    (BASELINE config 3 / reference §3.5)."""
    chain = px.WrapBox(convention="minirange").then(px.ShiftPosTo("ssc"))
    re = px.ParamContain("r", 0.5, "mass")
    calc = (px.ParamSum("mass")
            .transform(chain)
            .filter(px.Sphere(0.5 * re)))
    res = calc.run(snap)
    assert res.ok
    assert 0 < float(res.value.value) < 1.38e11


def test_config4_full_kappa_pipeline(snap):
    """WrapBox→ShiftPosTo(ssc)→ShiftVelTo(com)→AlignVec(AngMomVec) on stars
    within 30 kpc (BASELINE config 4)."""
    chain, sel = _kappa_chain()
    kappa = float(px.KappaRot().transform(chain).filter(sel)(snap))
    assert 0.9 < kappa < 1.0  # cold disk, rotation-dominated
    # snapshot untouched afterwards (purity)
    assert float(np.asarray(snap["pos"]).min()) >= 0.0


def test_config4_shares_transform_work(snap):
    """Running two scoped properties under the same chain reuses the
    transform results via the run cache."""
    chain, sel = _kappa_chain()
    pipe = px.calculate.Pipeline({
        "kappa": px.KappaRot().transform(chain).filter(sel),
        "rhalf": px.ParamContain("r", 0.5, "mass").transform(chain).filter(sel),
    })
    res = pipe.run(snap)
    assert res.ok
    cache = res.diagnostics["cache"]
    assert cache["hits"] > 0  # chain evaluated once, reused by second output
    assert 0.9 < float(res.value["kappa"]) < 1.0
