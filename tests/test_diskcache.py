"""Persistent cross-run result cache (the signature_hash extension,
SURVEY.md §5 'checkpoint/resume')."""

import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.core.calculate import PropertyBase
from pynbodyext_tpu.core.calculate.diskcache import (signature_is_stable,
                                                     snapshot_fingerprint)


def test_signature_stability(centered_snap):
    assert signature_is_stable(px.ParamContain("r", 0.5, "mass").signature())
    assert signature_is_stable(
        px.KappaRot().filter(px.Sphere("30 kpc")).signature())
    # callables have process-local identity → unstable
    assert not signature_is_stable(px.Sphere(lambda s: 5.0).signature())
    # big arrays fall back to id() → unstable
    big = np.arange(1000.0)
    assert not signature_is_stable(px.Sphere(5.0, cen=big).signature())


def test_fingerprint_stability(centered_snap):
    a = snapshot_fingerprint(centered_snap)
    b = snapshot_fingerprint(centered_snap)
    assert a == b
    other = px.make_test_galaxy(500, 500, 500, seed=99)
    assert snapshot_fingerprint(other) != a


def test_disk_cache_round_trip(tmp_path, centered_snap):
    calls = {"n": 0}

    @PropertyBase.dataclass
    class Expensive(PropertyBase):
        def calculate(self, sim, params):
            calls["n"] += 1
            return px.qarray(float(np.asarray(sim["mass"]).sum()), "Msol")

    cache_dir = str(tmp_path / "memo")
    r1 = Expensive().run(centered_snap, disk_cache=cache_dir)
    assert calls["n"] == 1
    assert r1.diagnostics["disk_cache"]["stores"] == 1

    # second run (fresh engine = "new session"): served from disk
    r2 = Expensive().run(centered_snap, disk_cache=cache_dir)
    assert calls["n"] == 1
    assert r2.diagnostics["disk_cache"]["hits"] == 1
    assert float(r2.value.value) == pytest.approx(float(r1.value.value))
    assert str(r2.value.units) == "Msol"


def test_disk_cache_distinguishes_scope(tmp_path, centered_snap):
    cache_dir = str(tmp_path / "memo")
    re_star = px.ParamContain("r", 0.5, "mass").filter(px.FamilyFilter("star"))
    re_dm = px.ParamContain("r", 0.5, "mass").filter(px.FamilyFilter("dm"))
    v1 = float(re_star(centered_snap, disk_cache=cache_dir).value)
    v2 = float(re_dm(centered_snap, disk_cache=cache_dir).value)
    assert v1 != pytest.approx(v2)
    # repeated scoped run hits disk
    r = re_star.run(centered_snap, disk_cache=cache_dir)
    assert r.diagnostics["disk_cache"]["hits"] >= 1
    assert float(r.value.value) == pytest.approx(v1)


def test_disk_cache_ignores_unstable_nodes(tmp_path, centered_snap):
    cache_dir = str(tmp_path / "memo")
    node = px.ParamSum("mass").filter(px.Sphere(lambda s: 10.0))
    r = node.run(centered_snap, disk_cache=cache_dir)
    # nothing stored for the unstable bound node (lambda-valued param);
    # the run still succeeds
    assert r.ok


def test_disk_cache_scoped_nodes(tmp_path, centered_snap):
    """Scoped (filtered/transformed) nodes disk-cache too — the scope token
    is built from structural signatures, not object ids."""
    calls = {"n": 0}

    @PropertyBase.dataclass
    class Expensive(PropertyBase):
        def calculate(self, sim, params):
            calls["n"] += 1
            import pynbodyext_tpu as _px
            return _px.qarray(
                float(np.asarray(sim["mass"])[np.asarray(
                    sim.effective_mask)].sum()), "Msol")

    cache_dir = str(tmp_path / "memo")
    node = Expensive().filter(px.FamilyFilter("star"))
    v1 = float(node(centered_snap, disk_cache=cache_dir).value)
    assert calls["n"] == 1
    r2 = node.run(centered_snap, disk_cache=cache_dir)
    assert calls["n"] == 1  # served from disk
    assert r2.diagnostics["disk_cache"]["hits"] >= 1
    assert float(r2.value.value) == pytest.approx(v1)
