"""Property calculators: golden values on the deterministic galaxy +
algebraic invariants (mirrors reference property_test.py, SURVEY.md §4)."""

import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.units import parse_unit


def test_total_mass_golden(snap):
    """Golden-value regression: total mass of the seeded galaxy."""
    total = px.ParamSum("mass")(snap)
    expected = 8e9 * 1.0e6 / 1e9  # n_gas*1e6 …
    # exact composition: 8000*1e6 + 12000*1e7 + 5000*2e6 = 1.38e11
    assert float(total.value) == pytest.approx(1.38e11, rel=1e-4)
    assert total.units == parse_unit("Msol")


def test_param_contain_matches_numpy(centered_snap):
    s = centered_snap
    re = px.ParamContain("r", 0.5, "mass")
    got = float(re(s).value)
    r = np.asarray(s["r"], dtype=np.float64)
    m = np.asarray(s["mass"], dtype=np.float64)
    order = np.argsort(r)
    cum = np.cumsum(m[order])
    cum = (cum - cum[0]) / (cum[-1] - cum[0])
    exp = np.interp(0.5, cum, r[order])
    assert got == pytest.approx(exp, rel=1e-4)


def test_param_contain_vector_frac(centered_snap):
    vals = px.ParamContain("r", [0.1, 0.5, 0.9], "mass")(centered_snap)
    arr = np.asarray(vals)
    assert arr.shape == (3,)
    assert np.all(np.diff(arr) > 0)  # monotone in frac


def test_param_contain_frac_validation(centered_snap):
    with pytest.raises(ValueError):
        px.ParamContain("r", 1.5, "mass")(centered_snap)


def test_symbolic_op_equivalence(centered_snap):
    """2*re == re+re ; (re**3) has volume units (reference property_test)."""
    re = px.ParamContain("r", 0.5, "mass")
    v1 = (2 * re)(centered_snap)
    v2 = (re + re)(centered_snap)
    assert float(v1.value) == pytest.approx(float(v2.value), rel=1e-6)
    v3 = (re ** 3)(centered_snap)
    assert v3.units == parse_unit("kpc**3")


def test_cen_pos_modes(snap):
    # galaxy truly centered at (250,250,250)
    for mode in ("ssc", "com"):
        cen = np.asarray(px.CenPos(mode)(snap).value)
        # com dragged by halo asymmetry but still close; ssc tight
        tol = 0.5 if mode == "ssc" else 30.0
        np.testing.assert_allclose(cen, [250.0, 250.0, 250.0], atol=tol)


def test_cen_vel(snap):
    vcen = np.asarray(px.CenVel()(snap).value)
    np.testing.assert_allclose(vcen, [100.0, -50.0, 25.0], atol=3.0)


def test_ang_mom_vec(centered_snap):
    am = px.AngMomVec()
    got = np.asarray(am.filter(px.FamilyFilter("star"))(centered_snap).value)
    pos = np.asarray(centered_snap["pos"], dtype=np.float64)
    vel = np.asarray(centered_snap["vel"], dtype=np.float64)
    m = np.asarray(centered_snap["mass"], dtype=np.float64)
    sl = centered_snap.family_slices["star"]
    exp = (m[sl, None] * np.cross(pos[sl], vel[sl])).sum(0)
    np.testing.assert_allclose(got, exp, rtol=1e-3)


def test_kappa_rot_disk_high(centered_snap):
    k = float(px.KappaRot().filter(px.FamilyFilter("star"))(centered_snap))
    assert 0.9 < k < 1.0  # cold rotating disk


def test_kappa_rot_halo_low(centered_snap):
    k = float(px.KappaRot().filter(px.FamilyFilter("dm"))(centered_snap))
    # isotropic velocities → E[vφ²]/E[v²] = 1/3
    assert abs(k - 1.0 / 3.0) < 0.05


def test_volume_density_matches_numpy(centered_snap):
    s = centered_snap
    got = float(px.VolumeDensity(10.0, "mass")(s).value)
    r = np.asarray(s["r"])
    m = np.asarray(s["mass"], dtype=np.float64)
    exp = m[(r > 0) & (r < 10)].sum() / (4 / 3 * np.pi * 1e3)
    assert got == pytest.approx(exp, rel=1e-4)


def test_surface_density_matches_numpy(centered_snap):
    s = centered_snap
    got = float(px.SurfaceDensity(10.0)(s).value)
    rxy = np.asarray(s["rxy"])
    m = np.asarray(s["mass"], dtype=np.float64)
    exp = m[(rxy > 0) & (rxy < 10)].sum() / (np.pi * 100)
    assert got == pytest.approx(exp, rel=1e-4)


def test_radius_at_surface_density_total(centered_snap):
    s = centered_snap
    sigma10 = float(px.SurfaceDensity(10.0)(s).value)
    # Σ(<r)=target should solve near r=10 in 'total' mode
    got = float(px.RadiusAtSurfaceDensity(sigma10, mode="total")(s).value)
    assert got == pytest.approx(10.0, rel=0.05)


def test_pattern_speed_sign(centered_snap):
    """Disk rotates counter-clockwise (positive jz) → Ω_z positive."""
    omega = px.PatternSpeed().filter(px.FamilyFilter("star"))(centered_snap)
    assert float(omega.value) > 0


def test_virial_radius_monotone(centered_snap):
    r200 = float(px.VirialRadius(200.0)(centered_snap).value)
    r500 = float(px.VirialRadius(500.0)(centered_snap).value)
    assert 0 < r500 < r200


def test_spin_param_range(centered_snap):
    lam = float(px.SpinParam().filter(px.FamilyFilter("dm"))(centered_snap))
    assert 0 < lam < 1
