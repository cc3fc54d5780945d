"""Native Barnes–Hut octree tests.

Mirrors the Rust crate's suites (SURVEY.md §4):
* ``gravity_tests.rs``: tree(θ=0) ≡ direct to ≤1e-10 (f64), at-points;
* ``single_node.rs``: multipole far-field convergence;
* ``translate_multipole.rs``: M2M identity for all 56 order-5 moments.
"""

import numpy as np
import pytest

pytest.importorskip("ctypes")

from pynbodyext_tpu.gravity.tree import (Octree, native_direct_accelerations,
                                         native_direct_potentials)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    n = 1500
    return (rng.normal(0, 1, (n, 3)), rng.uniform(0.5, 2, n),
            rng.uniform(0.02, 0.08, n))


@pytest.mark.parametrize("kernel", [None, "plummer", "spline"])
def test_tree_theta0_equals_direct(cloud, kernel):
    """Full traversal (θ=0) must reproduce the direct sum to 1e-10
    (reference ``gravity_tests.rs:57-100``)."""
    pos, m, h = cloud
    hh = None if kernel is None else h
    tree = Octree(pos, m, leaf_capacity=16, multipole_order=3,
                  softenings=hh, kernel=kernel)
    np.testing.assert_allclose(
        tree.compute_potentials(theta=0.0),
        native_direct_potentials(pos, m, hh, kernel=kernel), atol=1e-10,
        rtol=1e-10)
    np.testing.assert_allclose(
        tree.compute_accelerations(theta=0.0),
        native_direct_accelerations(pos, m, hh, kernel=kernel), atol=1e-9,
        rtol=1e-9)


def test_tree_accuracy_improves_with_order(cloud):
    """At θ=0.5 the expansion converges cleanly with order (at θ≳0.7 the
    max error is dominated by marginal cells where the Taylor series
    converges slowly — only the mean improves, which we also check)."""
    pos, m, _ = cloud
    pd = native_direct_potentials(pos, m)
    errs, means7 = [], []
    for order in (0, 2, 3, 5):
        tree = Octree(pos, m, leaf_capacity=16, multipole_order=order)
        rel = np.abs((tree.compute_potentials(theta=0.5) - pd) / pd)
        errs.append(rel.max())
        rel7 = np.abs((tree.compute_potentials(theta=0.7) - pd) / pd)
        means7.append(rel7.mean())
    assert errs[-1] < errs[0] / 20
    assert errs[-1] < 1e-4
    assert means7[-1] < means7[0] / 20


def test_tree_at_points(cloud):
    pos, m, h = cloud
    rng = np.random.default_rng(9)
    tgts = rng.normal(0, 3, (100, 3))
    tree = Octree(pos, m, leaf_capacity=16, multipole_order=4,
                  softenings=h, kernel="spline")
    pt = tree.potentials_at_points(tgts, theta=0.0)
    pd = native_direct_potentials(pos, m, h, targets=tgts, kernel="spline")
    np.testing.assert_allclose(pt, pd, rtol=1e-10)
    at = tree.accelerations_at_points(tgts, theta=0.5)
    ad = native_direct_accelerations(pos, m, h, targets=tgts,
                                     kernel="spline")
    err = np.linalg.norm(at - ad, axis=1)
    assert err.max() / np.median(np.linalg.norm(ad, axis=1)) < 1e-2


def test_tree_threads_consistent(cloud):
    pos, m, _ = cloud
    tree = Octree(pos, m, leaf_capacity=16, multipole_order=3)
    a = tree.compute_potentials(theta=0.7, threads=1)
    b = tree.compute_potentials(theta=0.7, threads=4)
    np.testing.assert_array_equal(a, b)


def test_native_direct_matches_jnp_reference(cloud):
    """Cross-language consistency: native C++ direct ≡ jnp reference."""
    from pynbodyext_tpu.gravity import direct_potentials_ref
    pos, m, h = cloud
    nat = native_direct_potentials(pos, m, h, kernel="plummer")
    jx = np.asarray(direct_potentials_ref(
        pos.astype(np.float32), m.astype(np.float32),
        h.astype(np.float32), kernel="plummer"))
    np.testing.assert_allclose(jx, nat, rtol=2e-4)


def test_single_node_multipole_far_field():
    """Multipole expansion of a point cluster converges at a far target
    (reference ``single_node.rs``)."""
    from math import factorial
    from pynbodyext_tpu.gravity._multipole_tables import TABLES

    def eval_D(n, x, y, z):
        r = np.sqrt(x * x + y * y + z * z)
        return sum(c * x ** a * y ** b * z ** cc * r ** (-mm)
                   for a, b, cc, mm, c in TABLES[n])

    rng = np.random.default_rng(0)
    src = rng.normal(0, 0.1, (50, 3))
    m = rng.uniform(0.5, 1.5, 50)
    com = (src * m[:, None]).sum(0) / m.sum()
    tgt = np.array([3.0, 1.0, -2.0])
    direct = -np.sum(m / np.linalg.norm(tgt - src, axis=1))

    def multi_indices(order):
        return [(i, j, t - i - j) for t in range(order + 1)
                for i in range(t, -1, -1) for j in range(t - i, -1, -1)]

    prev_err = np.inf
    for order in (0, 2, 3, 5):
        phi = 0.0
        d = tgt - com
        for (i, j, k) in multi_indices(order):
            Mn = np.sum(m * (src[:, 0] - com[0]) ** i
                        * (src[:, 1] - com[1]) ** j
                        * (src[:, 2] - com[2]) ** k) / (
                factorial(i) * factorial(j) * factorial(k))
            phi += Mn * (-1) ** (i + j + k) * eval_D((i, j, k), *d)
        err = abs(-phi - direct)
        assert err <= prev_err * 1.5
        prev_err = err
    assert prev_err < 1e-8


def test_m2m_translation_identity():
    """Translate moments B→A ≡ moments computed at A, all 56 components
    ≤1e-10 (reference ``translate_multipole.rs:29``)."""
    from math import factorial
    rng = np.random.default_rng(2)
    src = rng.normal(0, 0.3, (40, 3))
    m = rng.uniform(0.5, 1.5, 40)
    B = src.mean(0)
    A = B + np.array([0.4, -0.2, 0.15])

    def multi_indices(order):
        return [(i, j, t - i - j) for t in range(order + 1)
                for i in range(t, -1, -1) for j in range(t - i, -1, -1)]

    def moments(center):
        return {(i, j, k): np.sum(
            m * (src[:, 0] - center[0]) ** i * (src[:, 1] - center[1]) ** j
            * (src[:, 2] - center[2]) ** k)
            / (factorial(i) * factorial(j) * factorial(k))
            for (i, j, k) in multi_indices(5)}

    MB, MA = moments(B), moments(A)
    assert len(MB) == 56
    d = B - A
    for (i, j, k) in multi_indices(5):
        tot = sum(MB[(p, q, s)]
                  * d[0] ** (i - p) * d[1] ** (j - q) * d[2] ** (k - s)
                  / (factorial(i - p) * factorial(j - q) * factorial(k - s))
                  for p in range(i + 1) for q in range(j + 1)
                  for s in range(k + 1))
        assert abs(tot - MA[(i, j, k)]) < 1e-10


def test_gravity_class_tree_methods(cloud):
    """Gravity.tree_potentials/tree_accelerations end-to-end
    (reference ``gravity/base.py:336``)."""
    from pynbodyext_tpu.gravity import Gravity, KernelKind, TreeOptions
    pos, m, h = cloud
    g = Gravity(pos.astype(np.float32), m.astype(np.float32),
                softening=h.astype(np.float32), kernel=KernelKind.Plummer,
                tree_options=TreeOptions(leaf_capacity=16, multipole_order=3),
                force_reference=True)
    pt = g.tree_potentials(theta=0.0)
    pd = native_direct_potentials(pos, m, h, kernel="plummer")
    np.testing.assert_allclose(np.asarray(pt), pd, rtol=2e-4)
    at = g.tree_accelerations(theta=0.7)
    assert np.asarray(at).shape == (len(pos), 3)


def test_leaf_capacity_invariance(cloud):
    pos, m, _ = cloud
    a = Octree(pos, m, leaf_capacity=8,
               multipole_order=0).compute_potentials(theta=0.0)
    b = Octree(pos, m, leaf_capacity=64,
               multipole_order=0).compute_potentials(theta=0.0)
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_soft_admissibility_includes_target_softening():
    """A self-set target whose softening exceeds its surroundings must not
    receive unsoftened far-field contributions inside its own softening
    scale (reference ``tree.rs:56-70`` node_soft_ok uses
    max(node hmax, target h); round-1 advisor finding)."""
    rng = np.random.default_rng(3)
    n = 4000
    pos = rng.normal(0, 1, (n, 3))
    m = rng.uniform(0.5, 2, n)
    h = np.full(n, 0.01)
    h[0] = 2.0  # softening spans most of the cluster
    pd = native_direct_potentials(pos, m, h, kernel="spline")
    ad = native_direct_accelerations(pos, m, h, kernel="spline")
    tree = Octree(pos, m, leaf_capacity=16, multipole_order=3,
                  softenings=h, kernel="spline")
    pt = tree.compute_potentials(theta=0.8)
    at = tree.compute_accelerations(theta=0.8)
    assert abs((pt[0] - pd[0]) / pd[0]) < 1e-3
    scale = np.linalg.norm(ad[0]) + np.abs(ad).max() * 1e-3
    assert np.linalg.norm(at[0] - ad[0]) / scale < 2e-2


def test_hilbert_leaf_order_is_unit_step_continuous():
    """The Hilbert DFS (csrc/hilbert_tables.h) must order leaves along a
    unit-step-continuous space-filling curve — consecutive leaf centers
    of a full 8x8x8 grid differ by exactly one grid step.  Morton/Z-order
    fails this (~50% of steps are jumps), which is exactly why the device
    engines' near-field windows fragment under it."""
    g = np.arange(8) + 0.5
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    pos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1)
    rng = np.random.default_rng(0)
    pos = pos[rng.permutation(len(pos))]  # input order must not matter
    frac = {}
    for curve in ("hilbert", "morton"):
        tree = Octree(pos, leaf_capacity=1, curve=curve)
        tree.block_lists(theta=0.7, block_size=0)  # numbers the leaves
        p, _, _, _ = tree.particles_tree_order()
        lstarts, lcounts = tree.leaves()
        assert len(lstarts) == 512 and (lcounts == 1).all()
        steps = np.abs(np.diff(p[lstarts], axis=0)).sum(axis=1)
        frac[curve] = float((steps == 1.0).mean())
    assert frac["hilbert"] == 1.0
    assert frac["morton"] < 0.6  # sanity: Z-order genuinely differs


def test_hilbert_and_morton_trees_agree():
    """Child visit order must not change any physics: theta=0 solves are
    bit-level-reordered sums only (1e-12 relative)."""
    rng = np.random.default_rng(7)
    n = 2500
    pos = rng.normal(0, 10, (n, 3))
    m = rng.uniform(0.5, 2, n)
    ph = Octree(pos, m, leaf_capacity=16,
                curve="hilbert").compute_potentials(theta=0.0)
    pm = Octree(pos, m, leaf_capacity=16,
                curve="morton").compute_potentials(theta=0.0)
    assert np.abs(ph - pm).max() / np.abs(pm).max() < 1e-12
    ah = Octree(pos, m, leaf_capacity=16,
                curve="hilbert").compute_accelerations(theta=0.0)
    am = Octree(pos, m, leaf_capacity=16,
                curve="morton").compute_accelerations(theta=0.0)
    assert np.abs(ah - am).max() / np.abs(am).max() < 1e-12
