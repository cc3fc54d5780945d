"""Gravity: softening kernels, direct sums, Pallas kernel (interpret mode on
CPU), API with units.

Mirrors the Rust crate's cross-validation discipline
(``crates/gravity/tests/gravity_tests.rs``): fast path vs reference path on
seeded data, documented f32 tolerances (the Rust f64 bars of 1e-10 relax to
~1e-5 relative in f32, SURVEY.md §7 "f64 on TPU").
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.gravity import (Gravity, KernelKind,
                                    calculate_acceleration,
                                    calculate_potential,
                                    direct_accelerations,
                                    direct_accelerations_ref,
                                    direct_potentials, direct_potentials_ref)
from pynbodyext_tpu.gravity.kernels import (kernel_accel_factor,
                                            kernel_potential_per_unit_mass,
                                            w2, w2_prime)

REL = 2e-5


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    n = 600
    return (rng.normal(0, 1, (n, 3)).astype(np.float32),
            rng.uniform(0.5, 2, n).astype(np.float32),
            rng.uniform(0.02, 0.1, n).astype(np.float32))


def _np_direct(pos, m, h, kernel, targets=None):
    """f64 numpy ground truth with the reference's conventions."""
    pos64 = pos.astype(np.float64)
    m64 = m.astype(np.float64)
    h64 = (h if h is not None else np.zeros(len(pos))).astype(np.float64)
    tg = pos64 if targets is None else targets.astype(np.float64)
    pots = np.zeros(len(tg))
    accs = np.zeros((len(tg), 3))
    for i in range(len(tg)):
        d = pos64 - tg[i]
        r = np.sqrt((d * d).sum(1))
        hh = np.maximum(h64[i], h64) if targets is None else h64
        if kernel == "none":
            phi = np.where(r > 0, -1 / np.where(r > 0, r, 1), 0.0)
            g = np.where(r > 0, 1 / np.where(r > 0, r, 1) ** 3, 0.0)
        elif kernel == "plummer":
            s2 = r * r + hh * hh
            phi = np.where(r > 0, -1 / np.sqrt(s2), 0.0)
            g = np.where(r > 0, 1 / (np.sqrt(s2) * s2), 0.0)
        else:  # spline — use our jnp kernels at f64-ish via numpy formulas
            phi = np.asarray(kernel_potential_per_unit_mass(
                "spline", jnp.asarray(r), jnp.asarray(hh)), dtype=np.float64)
            g = np.asarray(kernel_accel_factor(
                "spline", jnp.asarray(r), jnp.asarray(hh)), dtype=np.float64)
        if targets is None:
            phi[i] = 0.0
            g[i] = 0.0
        pots[i] = (phi * m64).sum()
        accs[i] = (d * (g * m64)[:, None]).sum(0)
    return pots, accs


def test_w2_matches_newtonian_outside():
    u = jnp.asarray([1.0, 1.5, 3.0])
    np.testing.assert_allclose(np.asarray(w2(u)), -1 / np.asarray(u),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w2_prime(u)),
                               1 / np.asarray(u) ** 2, rtol=1e-6)


def test_w2_continuity():
    """Piecewise segments meet at u=0.5 and u=1 (Springel eq. 71)."""
    eps = 1e-5
    for fn in (w2, w2_prime):
        for knot in (0.5, 1.0):
            lo = float(fn(jnp.asarray(knot - eps)))
            hi = float(fn(jnp.asarray(knot + eps)))
            assert lo == pytest.approx(hi, abs=1e-3)


def test_spline_potential_deep_softening():
    """φ(0⁺; h) → W2(0)/h = −14/5/h (finite, not divergent)."""
    v = float(kernel_potential_per_unit_mass("spline", jnp.asarray(1e-7),
                                             jnp.asarray(2.0)))
    assert v == pytest.approx(-14.0 / 5.0 / 2.0, rel=1e-4)


@pytest.mark.parametrize("kernel", ["none", "plummer", "spline"])
def test_reference_vs_numpy_self(cloud, kernel):
    pos, m, h = cloud
    hh = None if kernel == "none" else h
    tp, ta = _np_direct(pos, m, hh, kernel)
    got_p = np.asarray(direct_potentials_ref(pos, m, hh, kernel=kernel))
    got_a = np.asarray(direct_accelerations_ref(pos, m, hh, kernel=kernel))
    np.testing.assert_allclose(got_p, tp, rtol=REL)
    np.testing.assert_allclose(got_a, ta,
                               rtol=1e-3, atol=np.abs(ta).max() * 1e-5)


@pytest.mark.parametrize("kernel", ["none", "plummer", "spline"])
def test_pallas_vs_reference_self(cloud, kernel):
    """Pallas (interpret mode) ≡ blocked jnp reference."""
    pos, m, h = cloud
    hh = None if kernel == "none" else h
    ref_p = np.asarray(direct_potentials_ref(pos, m, hh, kernel=kernel))
    pal_p = np.asarray(direct_potentials(pos, m, hh, kernel=kernel,
                                         tm=128, ts=256, interpret=True))
    np.testing.assert_allclose(pal_p, ref_p, rtol=1e-4)
    ref_a = np.asarray(direct_accelerations_ref(pos, m, hh, kernel=kernel))
    pal_a = np.asarray(direct_accelerations(pos, m, hh, kernel=kernel,
                                            tm=128, ts=256, interpret=True))
    np.testing.assert_allclose(pal_a, ref_a, rtol=1e-3,
                               atol=np.abs(ref_a).max() * 1e-5)


def test_at_points(cloud):
    pos, m, h = cloud
    rng = np.random.default_rng(5)
    targets = rng.normal(0, 2, (100, 3)).astype(np.float32)
    tp, ta = _np_direct(pos, m, h, "plummer", targets=targets)
    got = np.asarray(direct_potentials_ref(pos, m, h, targets=targets,
                                           kernel="plummer"))
    np.testing.assert_allclose(got, tp, rtol=REL)
    pal = np.asarray(direct_potentials(pos, m, h, targets=targets,
                                       kernel="plummer", tm=128, ts=256,
                                       interpret=True))
    np.testing.assert_allclose(pal, tp, rtol=1e-4)
    got_a = np.asarray(direct_accelerations_ref(pos, m, h, targets=targets,
                                                kernel="plummer"))
    np.testing.assert_allclose(got_a, ta, rtol=1e-3,
                               atol=np.abs(ta).max() * 1e-5)


def test_pair_softening_is_max(cloud):
    """Self-set softening pairs as max(hi,hj) — asymmetric h must matter."""
    pos = np.array([[0, 0, 0], [1, 0, 0]], dtype=np.float32)
    m = np.ones(2, dtype=np.float32)
    h = np.array([0.5, 0.0], dtype=np.float32)
    pot = np.asarray(direct_potentials_ref(pos, m, h, kernel="plummer"))
    exp = -1 / np.sqrt(1 + 0.25)
    np.testing.assert_allclose(pot, [exp, exp], rtol=1e-6)


def test_newtonian_two_body():
    pos = np.array([[0, 0, 0], [2, 0, 0]], dtype=np.float32)
    m = np.array([3.0, 5.0], dtype=np.float32)
    pot = np.asarray(direct_potentials_ref(pos, m, kernel="none"))
    np.testing.assert_allclose(pot, [-5 / 2, -3 / 2], rtol=1e-6)
    acc = np.asarray(direct_accelerations_ref(pos, m, kernel="none"))
    np.testing.assert_allclose(acc[0], [5 / 4, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(acc[1], [-3 / 4, 0, 0], rtol=1e-6)


def test_gravity_class_api(cloud):
    pos, m, h = cloud
    g = Gravity(pos, m, softening=0.05, kernel=KernelKind.Spline)
    pot = np.asarray(g.direct_potentials())
    ref = np.asarray(direct_potentials_ref(
        pos, m, np.full(len(pos), 0.05, np.float32), kernel="spline"))
    np.testing.assert_allclose(pot, ref, rtol=1e-5)
    # per-call kernel override
    pot2 = np.asarray(g.direct_potentials(kernel=KernelKind.Plummer))
    assert not np.allclose(pot, pot2)
    # shape validation
    with pytest.raises(ValueError):
        Gravity(pos[:, :2])
    with pytest.raises(ValueError):
        Gravity(pos, m[:10])


def test_calculate_potential_units(centered_snap):
    sub = centered_snap[px.Sphere(5.0)]
    pot = calculate_potential(sub, softening="0.1 kpc", method="direct")
    assert str(pot.units) == "km**2 s**-2"
    assert pot.shape[0] == len(sub)
    assert float(np.asarray(pot).max()) < 0  # bound system, φ < 0
    acc = calculate_acceleration(sub, softening="0.1 kpc")
    assert acc.shape == (len(sub), 3)
    assert acc.units == px.parse_unit("km s**-2")


def test_energy_conservation_virial_scale(cloud):
    """|φ| and |a| scale linearly with mass (sanity on unit plumbing)."""
    pos, m, h = cloud
    p1 = np.asarray(direct_potentials_ref(pos, m, kernel="none"))
    p2 = np.asarray(direct_potentials_ref(pos, 2 * m, kernel="none"))
    np.testing.assert_allclose(p2, 2 * p1, rtol=1e-5)


def test_auto_method_selection(cloud):
    """method='auto' picks dense below the measured crossover, tree above
    (VERDICT r3 §next-8; reference threshold idiom: direct.rs:115-187)."""
    from pynbodyext_tpu.gravity.api import (DENSE_TREE_CROSSOVER_CPU,
                                            DENSE_TREE_CROSSOVER_TPU)
    pos, m, h = cloud
    g = Gravity(pos, m, 0.05, force_reference=True)
    assert g.auto_method() == "direct"  # tiny cloud → dense
    # auto == direct result for small N
    np.testing.assert_allclose(np.asarray(g.potentials(method="auto")),
                               np.asarray(g.direct_potentials()), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g.accelerations(method="auto")),
        np.asarray(g.direct_accelerations()), rtol=1e-6)
    # above the crossover the pick flips to a tree path (no solve run)
    big = np.zeros((DENSE_TREE_CROSSOVER_CPU + 1, 3), np.float32)
    g_big = Gravity(big, force_reference=True)
    assert g_big.auto_method() == "tree"
    g_tpu = Gravity(big, force_reference=False)
    assert g_tpu.auto_method() == "direct"  # below the TPU crossover
    big_tpu = np.zeros((DENSE_TREE_CROSSOVER_TPU + 1, 3), np.float32)
    assert Gravity(big_tpu,
                   force_reference=False).auto_method() == "tree-device"
    with pytest.raises(ValueError):
        g.potentials(method="bogus")
