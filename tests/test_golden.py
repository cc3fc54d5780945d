"""Frozen f64 golden values for the five BASELINE.json configs.

The reference pins exact numbers on its real test snapshot
(``tests/property_test.py:20-44``: r_half 9.8005476, κ_rot 0.39817017, …).
pynbody and that data are absent here, so the same discipline is applied to
the deterministic synthetic snapshot: all five configs were evaluated once
in float64 on CPU (2026-08-16) and the results frozen below as cross-round
regression anchors.  The f64 path must reproduce them to ~1e-12; the
default f32 path must stay within documented tolerances.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pynbodyext_tpu as px

# frozen f64 anchors (snap fixture: make_test_galaxy(5000, 8000, 12000,
# seed=42, wrapped=True))
G1_MSTAR = 10_000_000_000.0
G1_RHALF = 2.129490469191312
G2_VR_P16_BIN3 = -71.17420191200378
G2_VR_P16_BIN10 = -44.76607410158225
G2_MASS_MED_BIN5 = 10_000_000.0
G3_MSUM = 43_135_000_000.0
G4_KAPPA = 0.9772107311056554
G5_PHI0 = -6162065678.191024
G5_PHI7777 = -7512416184.925964
G5_ACC100 = (2362307282.9056907, 3858161693.750616, 850567369.6753612)


@pytest.fixture(scope="module")
def snap64(snap):
    with jax.enable_x64():
        fields = {k: px.QArray(jnp.asarray(np.asarray(snap[k].value),
                                           jnp.float64), snap[k].units)
                  for k in snap.loaded_fields}
        yield px.Snapshot(fields, dict(snap.family_slices),
                          dict(snap.properties))


def test_golden_config1(snap64):
    with jax.enable_x64():
        stars = px.FamilyFilter("star")
        m = float(px.ParamSum("mass").filter(stars)(snap64).value)
        chain = px.WrapBox(convention="minirange").then(px.ShiftPosTo("ssc"))
        rhalf = float(px.ParamContain("r", 0.5, "mass").transform(chain)
                      .filter(stars)(snap64).value)
    assert m == pytest.approx(G1_MSTAR, rel=1e-12)
    assert rhalf == pytest.approx(G1_RHALF, rel=1e-10)


def test_golden_config2(snap64):
    from pynbodyext_tpu.profiles import RadialProfileBuilder
    with jax.enable_x64():
        pr = RadialProfileBuilder(ndim=3, weight="mass", bins_type="equaln",
                                  nbins=20)(snap64)
        p16 = np.asarray(pr["vr"]["p16"], np.float64)
        med = np.asarray(pr["mass"]["med"], np.float64)
    assert p16[3] == pytest.approx(G2_VR_P16_BIN3, rel=1e-10)
    assert p16[10] == pytest.approx(G2_VR_P16_BIN10, rel=1e-10)
    assert med[5] == pytest.approx(G2_MASS_MED_BIN5, rel=1e-12)


def test_golden_config3(snap64):
    with jax.enable_x64():
        chain = px.WrapBox(convention="minirange").then(px.ShiftPosTo("ssc"))
        re = px.ParamContain("r", 0.5, "mass")
        v = float(px.ParamSum("mass").transform(chain)
                  .filter(px.Sphere(0.5 * re))(snap64).value)
    assert v == pytest.approx(G3_MSUM, rel=1e-12)


def test_golden_config4_engine_and_fused(snap64):
    """Engine and fused pipelines both reproduce the frozen κ in f64 —
    fused-vs-engine parity at machine precision (BASELINE bar 1e-5)."""
    from pynbodyext_tpu.compiled import kappa_rot_pipeline
    with jax.enable_x64():
        sel = px.Sphere(30.0) & px.FamilyFilter("star")
        chain = (px.WrapBox(convention="minirange")
                 .then(px.ShiftPosTo("ssc"))
                 .then(px.ShiftVelTo("com").measure_with(sel))
                 .then(px.AlignVec(px.AngMomVec()).measure_with(sel)))
        k_engine = float(px.KappaRot().transform(chain).filter(sel)(snap64))
        box = snap64.properties.get("boxsize")
        L = float(box.to_value(snap64["pos"].units,
                               **snap64.units_context()))
        k_fused = float(kappa_rot_pipeline(
            snap64["pos"].value, snap64["vel"].value, snap64["mass"].value,
            snap64.family_mask("star"), jnp.float64(L)))
    assert k_engine == pytest.approx(G4_KAPPA, rel=1e-10)
    assert k_fused == pytest.approx(k_engine, rel=1e-12)


@pytest.mark.slow
def test_golden_config5(snap64):
    from pynbodyext_tpu.gravity import (direct_accelerations_ref,
                                        direct_potentials_ref)
    with jax.enable_x64():
        pos = snap64["pos"].value
        mass = snap64["mass"].value
        phi = direct_potentials_ref(pos, mass, 0.05, kernel="plummer")
        acc = direct_accelerations_ref(pos, mass, 0.05, kernel="plummer")
        phi0, phi7 = float(phi[0]), float(phi[7777])
        a100 = [float(x) for x in acc[100]]
    assert phi0 == pytest.approx(G5_PHI0, rel=1e-12)
    assert phi7 == pytest.approx(G5_PHI7777, rel=1e-12)
    np.testing.assert_allclose(a100, G5_ACC100, rtol=1e-12)


def test_f32_default_path_matches_golden(snap):
    """The default f32 path stays inside documented tolerance of the f64
    anchors (pipeline-level BASELINE bar: 1e-5; f32 gives ~1e-6 here)."""
    sel = px.Sphere(30.0) & px.FamilyFilter("star")
    chain = (px.WrapBox(convention="minirange")
             .then(px.ShiftPosTo("ssc"))
             .then(px.ShiftVelTo("com").measure_with(sel))
             .then(px.AlignVec(px.AngMomVec()).measure_with(sel)))
    k = float(px.KappaRot().transform(chain).filter(sel)(snap))
    assert k == pytest.approx(G4_KAPPA, rel=1e-5)
