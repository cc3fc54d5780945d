"""Filter tests: algebraic identities + geometric correctness.

Mirrors the reference's filter_test.py invariants (SURVEY.md §4):
partition ``len(bp1)+len(bp2)==len(snap)``, De Morgan ``~hp == lp``.
"""

import numpy as np
import pytest

import pynbodyext_tpu as px


def test_sphere_mask(centered_snap):
    s = centered_snap
    mask = px.Sphere(10.0).where(s)
    r = np.asarray(s["r"])
    np.testing.assert_array_equal(np.asarray(mask), r < 10.0)


def test_sphere_unit_string(centered_snap):
    m1 = px.Sphere("10 kpc").where(centered_snap)
    m2 = px.Sphere(10.0).where(centered_snap)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    m3 = px.Sphere("10000 pc").where(centered_snap)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m3))


def test_sphere_offcenter(centered_snap):
    cen = (1.0, 2.0, 3.0)
    mask = px.Sphere(5.0, cen).where(centered_snap)
    pos = np.asarray(centered_snap["pos"])
    d = np.linalg.norm(pos - np.asarray(cen), axis=1)
    np.testing.assert_array_equal(np.asarray(mask), d < 5.0)


def test_bandpass_partition(centered_snap):
    """len(lo)+len(hi) == len(snap) minus boundary (strict inequalities)."""
    s = centered_snap
    hp = px.HighPass("r", 10.0)
    lp = px.LowPass("r", 10.0)
    n_hi = int(hp.where(s).sum())
    n_lo = int(lp.where(s).sum())
    r = np.asarray(s["r"])
    n_eq = int((r == 10.0).sum())
    assert n_hi + n_lo + n_eq == len(s)


def test_de_morgan(centered_snap):
    s = centered_snap
    hp = px.HighPass("r", 10.0)
    lp = px.LowPass("r", 10.0)
    not_hp = np.asarray((~hp).where(s))
    lp_mask = np.asarray(lp.where(s))
    r = np.asarray(s["r"])
    # ~(r>10) == (r<=10); differs from (r<10) only at the boundary set
    np.testing.assert_array_equal(not_hp[r != 10.0], lp_mask[r != 10.0])


def test_and_or_combinators(centered_snap):
    s = centered_snap
    a = px.Sphere(15.0)
    b = px.FamilyFilter("star")
    m_and = np.asarray((a & b).where(s))
    m_or = np.asarray((a | b).where(s))
    ma, mb = np.asarray(a.where(s)), np.asarray(b.where(s))
    np.testing.assert_array_equal(m_and, ma & mb)
    np.testing.assert_array_equal(m_or, ma | mb)


def test_filter_indexes_snapshot(centered_snap):
    sub = centered_snap[px.Sphere(10.0)]
    assert len(sub) == int(px.Sphere(10.0).where(centered_snap).sum())
    # chained family access stays masked
    stars_in = sub.families("star")
    assert len(stars_in) <= len(centered_snap.s)


def test_annulus_and_volume(centered_snap):
    s = centered_snap
    ann = px.Annulus(2.0, 8.0)
    r = np.asarray(s["r"])
    np.testing.assert_array_equal(np.asarray(ann.where(s)),
                                  (r > 2.0) & (r < 8.0))
    assert ann.volume(s) == pytest.approx(4 / 3 * np.pi * (8 ** 3 - 2 ** 3))


def test_disc_and_solar(centered_snap):
    s = centered_snap
    pos = np.asarray(s["pos"])
    rxy = np.hypot(pos[:, 0], pos[:, 1])
    disc = px.Disc(5.0, 1.0)
    np.testing.assert_array_equal(np.asarray(disc.where(s)),
                                  (rxy < 5) & (np.abs(pos[:, 2]) < 1))
    sol = px.SolarNeighborhood()  # 5-10 kpc, |z|<2
    np.testing.assert_array_equal(
        np.asarray(sol.where(s)),
        (rxy > 5) & (rxy < 10) & (np.abs(pos[:, 2]) < 2))
    assert sol.volume(s) == pytest.approx(2 * np.pi * 2 * (100 - 25))


def test_cuboid(centered_snap):
    s = centered_snap
    pos = np.asarray(s["pos"])
    cub = px.Cuboid(-3.0)  # symmetric cube of side 6
    exp = np.all((pos > -3.0) & (pos < 3.0), axis=1)
    np.testing.assert_array_equal(np.asarray(cub.where(s)), exp)
    assert cub.volume(s) == pytest.approx(6.0 ** 3)


def test_filters_reject_prefilter(centered_snap):
    with pytest.raises(TypeError):
        px.Sphere(5.0).filter(px.FamilyFilter("star"))


def test_calculator_valued_radius(centered_snap):
    """Dynamic param: Sphere(0.5*re) with re a calculator (reference §3.5)."""
    re = px.ParamContain("r", 0.5, "mass")
    re_val = float(re(centered_snap).value)
    m1 = px.Sphere(0.5 * re).where(centered_snap)
    m2 = px.Sphere(0.5 * re_val).where(centered_snap)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
