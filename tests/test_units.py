"""Units and QArray tests."""


import numpy as np
import pytest

from pynbodyext_tpu.quantity import QArray
from pynbodyext_tpu.units import G, Unit, UnitError, parse_unit, units


def test_parse_and_ratio():
    assert parse_unit("km s**-1").ratio("m s**-1") == pytest.approx(1000.0)
    assert parse_unit("kpc").ratio("pc") == pytest.approx(1000.0)
    assert parse_unit("Msol kpc**-3").ratio("kg m**-3") == pytest.approx(
        1.98892e30 / 3.0856775814913673e19 ** 3)


def test_scaled_units():
    u = parse_unit("2.3e4 kpc")
    assert u.ratio("kpc") == pytest.approx(2.3e4)
    u2 = parse_unit("1e10 Msol h**-1")
    assert u2.ratio("Msol", h=0.7) == pytest.approx(1e10 / 0.7)


def test_cosmological_context():
    u = parse_unit("a kpc h**-1")
    assert u.ratio("kpc", a=0.5, h=0.7) == pytest.approx(0.5 / 0.7)
    with pytest.raises(UnitError):
        u.ratio("kpc")  # missing context


def test_incompatible_dimensions():
    with pytest.raises(UnitError):
        parse_unit("kpc").ratio("Msol")


def test_algebra():
    v = units.kpc / units.Myr
    assert v.same_dimensions("km s**-1")
    assert (units.kpc ** 2).ratio("pc**2") == pytest.approx(1e6)
    assert (2 * units.kpc).ratio("kpc") == pytest.approx(2.0)


def test_g_constant():
    # G·Msol/kpc should be a velocity² — the standard 4.3009e-6 (km/s)² kpc/Msol
    gv = (G * units.Msol / units.kpc).ratio("km**2 s**-2")
    assert gv == pytest.approx(4.3009e-6, rel=1e-3)


def test_qarray_arithmetic():
    a = QArray(np.array([1.0, 2.0]), "kpc")
    b = QArray(np.array([1000.0, 500.0]), "pc")
    s = a + b
    assert np.allclose(np.asarray(s), [2.0, 2.5])
    assert s.units == parse_unit("kpc")
    p = a * b
    assert p.units.same_dimensions("kpc**2")
    r = a.in_units("pc")
    assert np.allclose(np.asarray(r), [1000.0, 2000.0])


def test_qarray_pow_units():
    a = QArray(np.array([2.0]), "kpc")
    assert (a ** 3).units == parse_unit("kpc**3")


def test_qarray_comparison_converts():
    a = QArray(np.array([1.0, 3.0]), "kpc")
    m = a > QArray(np.array([2000.0, 2000.0]), "pc")
    assert list(np.asarray(m)) == [False, True]
