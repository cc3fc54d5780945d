"""Additional engine-semantics coverage: scopes, expr folding, param
coercion, option plumbing, sharded profiles, dryrun entry."""

import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.core.calculate import (CachePolicy, ConstantProperty,
                                           OpProperty, RecordPolicy, Scope,
                                           build_op)
from pynbodyext_tpu.quantity import QArray


def test_constant_folding():
    node = build_op("mul", (2.0, 3.0))
    assert isinstance(node, ConstantProperty)
    assert node.value == 6.0
    # mixed: constants folded, node preserved
    re = px.ParamContain("r", 0.5, "mass")
    expr = 2.0 * (3.0 * re)
    assert isinstance(expr, OpProperty)
    consts = [o for o in expr.operands if not hasattr(o, "signature")]
    assert consts == [6.0]


def test_scope_pipeline(snap):
    sc = Scope(filter=px.FamilyFilter("star"),
               transform=px.WrapBox(convention="minirange").then(
                   px.ShiftPosTo("ssc")))
    pipe = sc.pipeline({"rhalf": px.ParamContain("r", 0.5, "mass"),
                        "mtot": px.ParamSum("mass")})
    res = pipe.run(snap)
    assert float(res.value["mtot"].value) == pytest.approx(5000 * 2e6,
                                                           rel=1e-4)
    assert 0 < float(res.value["rhalf"].value) < 10


def test_mixed_combined(snap):
    """Property & filter → CombinedCalculator (tuple), not AndFilter."""
    combo = px.ParamSum("mass") & px.ParamContain("r", 0.5, "mass")
    res = combo.run(snap)
    assert len(res.value) == 2


def test_with_cache_and_record(snap):
    node = px.ParamSum("mass").with_cache(CachePolicy.NONE)
    assert node._cache_override == CachePolicy.NONE
    res = node.run(snap)
    assert res.diagnostics["cache"]["stores"] == 0
    node2 = px.ParamSum("mass").named("x").with_record(RecordPolicy.NONE)
    res2 = (node2 + 0.0).run(snap)
    assert res2.named["x"].summary is None or res2.named["x"].public is not None


def test_param_unit_coercion_qarray(centered_snap):
    """QArray params convert into the target field's units."""
    r_q = QArray(5000.0, "pc")  # == 5 kpc
    m1 = px.Sphere(r_q).where(centered_snap)
    m2 = px.Sphere(5.0).where(centered_snap)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_run_options_merge(snap):
    calc = px.ParamSum("mass")
    calc.default_options = {"perf_time": True}
    res = calc.run(snap)
    assert "perf" in res.reports
    calc.default_options = {}


def test_nodeinput_immutable(snap):
    from pynbodyext_tpu.core.calculate import NodeInput
    inp = NodeInput(snap)
    with pytest.raises(AttributeError):
        inp.sim = None


def test_sharded_profile_percentiles(snap):
    """Sort-based per-bin percentiles survive particle sharding."""
    from pynbodyext_tpu.parallel import make_mesh, shard_snapshot
    from pynbodyext_tpu.profiles import RadialProfile
    mesh = make_mesh()
    ssnap = shard_snapshot(snap, mesh)
    p1 = RadialProfile(snap, ndim=3, weight="mass", nbins=12,
                       bin_max=400.0)
    p2 = RadialProfile(ssnap, ndim=3, weight="mass", nbins=12,
                       bin_max=400.0)
    np.testing.assert_allclose(np.asarray(p2["vr"]["p16"]),
                               np.asarray(p1["vr"]["p16"]),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_dryrun_multichip_cpu():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_gadget_units_cosmological(tmp_path):
    """Loader attaches comoving units resolvable with a/h context."""
    import h5py
    path = str(tmp_path / "cosmo.hdf5")
    n = 16
    with h5py.File(path, "w") as f:
        hdr = f.create_group("Header")
        hdr.attrs["Time"] = 0.5       # a = 0.5
        hdr.attrs["Redshift"] = 1.0   # consistent: a = 1/(1+z)
        hdr.attrs["HubbleParam"] = 0.7
        hdr.attrs["BoxSize"] = 1000.0
        hdr.attrs["MassTable"] = np.zeros(6)
        g = f.create_group("PartType1")
        g.create_dataset("Coordinates", data=np.random.rand(n, 3) * 1000)
        g.create_dataset("Velocities", data=np.random.rand(n, 3))
        g.create_dataset("Masses", data=np.ones(n))
    snap = px.load_gadget_hdf5(path)
    assert len(snap) == n
    # pos units "a kpc h**-1" resolve with context a=0.5, h=0.7
    phys = snap["pos"].to_value("kpc", **snap.units_context())
    raw = np.asarray(snap["pos"].value)
    np.testing.assert_allclose(np.asarray(phys), raw * 0.5 / 0.7, rtol=1e-6)


def test_reference_readme_idioms(snap):
    """The reference README's public idioms work verbatim (README.md:30-60)."""
    re = px.ParamContain("r", 0.5, "mass").filter(px.FamilyFilter("star"))
    stellar_mass = px.ParamSum("mass").filter(px.FamilyFilter("star"))
    stellar_density = stellar_mass / (4 * np.pi * re ** 2)
    value = stellar_density(snap)
    assert float(value.value) > 0
    assert value.units.same_dimensions("Msol kpc**-2")
    scoped = (px.ParamContain("r", 0.5, "mass")
              .filter(px.Sphere("30 kpc") & px.FamilyFilter("star"))
              .transform(px.WrapBox(convention="minirange")
                         .then(px.ShiftPosTo("ssc"))))
    tree_repr = scoped.format_tree()
    assert "ParamContain" in tree_repr and "CenPos" in tree_repr
    res = scoped.run(snap, progress=None, perf_time=True)
    assert res.ok and 0 < float(res.value.value) < 30
    assert "perf" in res.reports
