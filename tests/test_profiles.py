"""Profile subsystem tests (mirrors reference profile_test.py invariants:
subprofile particle-count conservation, stat aliasing ``med == p50``,
plus per-bin statistics cross-validated against numpy loops)."""

import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.profiles import (Profile, RadialProfile,
                                     RadialProfileBuilder, StarAgeProfile,
                                     SubProfile, get_statistic)


@pytest.fixture(scope="module")
def prof_snap():
    return px.make_test_galaxy(3000, 2000, 4000, seed=7,
                               center=(0.0, 0.0, 0.0), vsys=(0.0, 0.0, 0.0))


@pytest.fixture(scope="module")
def prof(prof_snap):
    return RadialProfile(prof_snap, ndim=3, weight="mass",
                         bins_type="equaln", nbins=20)


def test_equaln_bins_have_equal_counts(prof):
    counts = prof.npart_bins
    assert counts.sum() == 9000
    assert counts.max() - counts.min() <= 2


def test_lin_log_edges(prof_snap):
    for bt in ("lin", "log"):
        pr = RadialProfile(prof_snap, ndim=3, bins_type=bt, nbins=15)
        edges = np.asarray(pr.bin_edges)
        assert len(edges) == 16
        assert np.all(np.diff(edges) > 0)
        if bt == "log":
            ratios = edges[1:] / edges[:-1]
            np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)


def test_binsize_spherical(prof):
    edges = np.asarray(prof.bin_edges)
    exp = 4 / 3 * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    np.testing.assert_allclose(np.asarray(prof.binsize), exp, rtol=1e-5)


def test_mass_enc_total(prof, prof_snap):
    total = float(px.ParamSum("mass")(prof_snap).value)
    assert float(np.asarray(prof["mass_enc"])[-1]) == pytest.approx(
        total, rel=1e-2)  # boundary particles may fall outside extrema


def test_density_units(prof):
    assert prof["density"].units == px.parse_unit("Msol kpc**-3")


def test_stat_vs_numpy_loop(prof, prof_snap):
    """Per-bin mean/sum/p16 cross-checked against the reference's per-bin
    loop algorithm in numpy."""
    vr = np.asarray(prof_snap["vr"], dtype=np.float64)
    m = np.asarray(prof_snap["mass"], dtype=np.float64)
    seg = np.asarray(prof.bins.seg_ids)
    valid = np.asarray(prof.bins.valid)
    got_mean = np.asarray(prof["vr"]["mean"])
    got_sum = np.asarray(prof["vr"]["sum"])
    got_p16 = np.asarray(prof["vr"]["p16"])
    got_disp = np.asarray(prof["vr"]["disp"])
    for b in [0, 7, 19]:
        sel = (seg == b) & valid
        arr, w = vr[sel], m[sel]
        assert got_mean[b] == pytest.approx((arr * w).sum() / w.sum(),
                                            rel=1e-3, abs=1e-3)
        assert got_sum[b] == pytest.approx(arr.sum(), rel=1e-3)
        order = np.argsort(arr)
        cum = np.cumsum(w[order])
        cum = (cum - cum[0]) / (cum[-1] - cum[0])
        assert got_p16[b] == pytest.approx(
            np.interp(0.16, cum, arr[order]), rel=1e-2, abs=1e-2)
        m1 = (arr * w).sum() / w.sum()
        m2 = (arr ** 2 * w).sum() / w.sum()
        assert got_disp[b] == pytest.approx(np.sqrt(m2 - m1 * m1), rel=1e-3)


def test_stat_aliases(prof):
    np.testing.assert_allclose(np.asarray(prof["temp"]["med"]),
                               np.asarray(prof["temp"]["p50"]),
                               equal_nan=True)
    np.testing.assert_allclose(np.asarray(prof["vr"]["abs"]),
                               np.asarray(prof["vr"]["abs_mean"]),
                               equal_nan=True)


def test_stat_suffix_parsing(prof):
    np.testing.assert_allclose(np.asarray(prof["vr_p16"]),
                               np.asarray(prof["vr"]["p16"]), equal_nan=True)
    np.testing.assert_allclose(np.asarray(prof["mass_sum"]),
                               np.asarray(prof["mass"]["sum"]),
                               equal_nan=True)


def test_stats_cached(prof):
    a = prof["vr"]["p16"]
    b = prof["vr"]["p16"]
    assert a is b


def test_unknown_stat_raises(prof):
    with pytest.raises(KeyError):
        prof["vr"]["bogus"]
    assert get_statistic("p200") is None
    assert get_statistic("p84") is not None


def test_subprofile_conservation(prof):
    """Counts across family subprofiles partition the parent
    (reference profile_test.py:22)."""
    total = (prof.s.npart_bins.sum() + prof.g.npart_bins.sum()
             + prof.dm.npart_bins.sum())
    assert total == prof.npart_bins.sum()


def test_subprofile_shares_edges(prof):
    np.testing.assert_array_equal(np.asarray(prof.s.bin_edges),
                                  np.asarray(prof.bin_edges))
    assert isinstance(prof.s, SubProfile)
    # cached
    assert prof.s is prof.s


def test_subprofile_by_filter(prof, prof_snap):
    sub = prof[px.Sphere(5.0)]
    r = np.asarray(prof_snap["r"])
    inside = (r < 5.0)
    edges = np.asarray(prof.bin_edges)
    in_range = (r >= edges[0]) & (r <= edges[-1])
    assert sub.npart_bins.sum() == (inside & in_range).sum()


def test_particles_at_bin(prof, prof_snap):
    view = prof.particles_at_bin[0]
    assert len(view) == prof.npart_bins[0]
    view2 = prof.particles_at_bin[0:3]
    assert len(view2) == prof.npart_bins[:3].sum()


def test_profile_property_registry_inheritance(prof):
    # density registered on SpatialProfile is visible on RadialProfile and
    # forwarded through subprofiles
    assert "density" in prof.keys()
    sub_density = np.asarray(prof.s["density"])
    assert sub_density.shape == (20,)


def test_builder_is_calculator_node(prof_snap):
    b = RadialProfileBuilder(ndim=3, weight="mass", nbins=10,
                             bin_max="15 kpc")
    p = b.filter(px.FamilyFilter("star"))(prof_snap)
    assert p.npart_bins.sum() <= 3000
    assert float(np.asarray(p.bin_edges)[-1]) == pytest.approx(15.0, rel=1e-5)


def test_star_age_profile(prof_snap):
    ap = StarAgeProfile(prof_snap, nbins=12)
    assert ap.npart_bins.sum() == 3000
    sfr = ap["sfr"]
    assert sfr.units == px.parse_unit("Msol Gyr**-1")
    # total formed mass = ∫ sfr dt
    total = (np.asarray(sfr) * np.asarray(ap.binsize)).sum()
    assert total == pytest.approx(3000 * 2e6, rel=1e-2)


def test_beta_isotropic_halo(prof_snap):
    pr = RadialProfile(prof_snap.dm, ndim=3, weight="mass", nbins=10,
                       bin_max=100.0)
    beta = np.asarray(pr["beta"])
    # isotropic velocities → β ≈ 0 (noisy per bin)
    ok = np.isfinite(beta)
    assert np.abs(np.nanmedian(beta[ok])) < 0.15


def test_custom_bins_by_callable(prof_snap):
    pr = Profile(prof_snap, bins_by=lambda v: v["ke"], bins_area="length",
                 nbins=8)
    assert pr.npart_bins.sum() > 0


def test_weighted_vs_unweighted(prof_snap):
    pw = RadialProfile(prof_snap, ndim=3, weight="mass", nbins=10)
    pu = RadialProfile(prof_snap, ndim=3, weight=None, nbins=10)
    a = np.asarray(pw["vr"]["mean"])
    b = np.asarray(pu["vr"]["mean"])
    assert not np.allclose(a, b, equal_nan=True)  # weights matter
