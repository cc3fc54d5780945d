"""ops/ cross-validation against pure numpy (the reference's "fast path vs
reference path" discipline, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pynbodyext_tpu import ops


@pytest.fixture()
def data(rng):
    n = 4096
    x = rng.normal(size=n).astype(np.float32)
    w = rng.uniform(0.5, 2.0, size=n).astype(np.float32)
    mask = rng.uniform(size=n) > 0.3
    return x, w, mask


def test_msum(data):
    x, w, mask = data
    assert float(ops.msum(jnp.asarray(x), jnp.asarray(mask))) == pytest.approx(
        x[mask].sum(), rel=1e-5)
    assert float(ops.msum(jnp.asarray(x), jnp.asarray(mask),
                          weights=jnp.asarray(w))) == pytest.approx(
        (x * w)[mask].sum(), rel=1e-5)


def test_mmean_weighted(data):
    x, w, mask = data
    expected = np.average(x[mask], weights=w[mask])
    got = float(ops.mmean(jnp.asarray(x), jnp.asarray(mask),
                          weights=jnp.asarray(w)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_mmin_mmax(data):
    x, w, mask = data
    assert float(ops.mmin(jnp.asarray(x), jnp.asarray(mask))) == pytest.approx(
        x[mask].min())
    assert float(ops.mmax(jnp.asarray(x), jnp.asarray(mask))) == pytest.approx(
        x[mask].max())


def _np_weighted_quantile(x, w, fracs, shift_first):
    order = np.argsort(x)
    xs, ws = x[order], w[order]
    cum = np.cumsum(ws)
    if shift_first:
        cum = (cum - cum[0]) / (cum[-1] - cum[0])
    else:
        cum = cum / cum[-1]
    return np.interp(fracs, cum, xs)


@pytest.mark.parametrize("shift_first", [False, True])
def test_weighted_quantile(data, shift_first):
    x, w, mask = data
    fracs = np.array([0.1, 0.25, 0.5, 0.84, 0.99])
    expected = _np_weighted_quantile(x[mask], w[mask], fracs, shift_first)
    got = np.asarray(ops.weighted_quantile(
        jnp.asarray(x), jnp.asarray(fracs), weights=jnp.asarray(w),
        mask=jnp.asarray(mask), shift_first=shift_first))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_containment_radius_matches_reference_algorithm(data):
    """ParamContain algorithm parity (reference properties/base.py:83-103)."""
    x, w, mask = data
    r = np.abs(x)
    expected = _np_weighted_quantile(r[mask], w[mask], 0.5, shift_first=True)
    got = float(ops.containment_radius(jnp.asarray(r), 0.5, jnp.asarray(w),
                                       mask=jnp.asarray(mask)))
    assert got == pytest.approx(float(expected), rel=1e-4)


def test_center_of_mass(rng):
    pos = rng.normal(5.0, 2.0, (1000, 3)).astype(np.float32)
    m = rng.uniform(1, 3, 1000).astype(np.float32)
    expected = (pos * m[:, None]).sum(0) / m.sum()
    got = np.asarray(ops.center_of_mass(jnp.asarray(pos), jnp.asarray(m)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_shrink_sphere_center_recovers_cluster(rng):
    # dense cluster at known center + broad uniform background
    cen = np.array([3.0, -2.0, 1.0], dtype=np.float32)
    cluster = rng.normal(0, 0.05, (2000, 3)).astype(np.float32) + cen
    bg = rng.uniform(-50, 50, (8000, 3)).astype(np.float32)
    pos = np.concatenate([cluster, bg])
    got = np.asarray(ops.shrink_sphere_center(jnp.asarray(pos)))
    np.testing.assert_allclose(got, cen, atol=0.05)


def test_shrink_sphere_center_masked(rng):
    cen = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    cluster = rng.normal(0, 0.1, (3000, 3)).astype(np.float32) + cen
    decoy = rng.normal(0, 0.1, (5000, 3)).astype(np.float32) - 20.0
    pos = np.concatenate([cluster, decoy])
    mask = np.zeros(8000, dtype=bool)
    mask[:3000] = True
    got = np.asarray(ops.shrink_sphere_center(jnp.asarray(pos),
                                              mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, cen, atol=0.1)


def test_potential_center(rng):
    pos = rng.normal(size=(500, 3)).astype(np.float32)
    phi = rng.normal(size=500).astype(np.float32)
    i = int(np.argmin(phi))
    got = np.asarray(ops.potential_center(jnp.asarray(pos), jnp.asarray(phi)))
    np.testing.assert_allclose(got, pos[i])


def test_faceon_matrix_properties(rng):
    for _ in range(5):
        v = rng.normal(size=3)
        R = np.asarray(ops.faceon_matrix(jnp.asarray(v)))
        # orthonormal
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        # maps v to +z
        rotated = R @ (v / np.linalg.norm(v))
        np.testing.assert_allclose(rotated, [0, 0, 1], atol=1e-5)
    # parallel-up fallback
    R = np.asarray(ops.faceon_matrix(jnp.asarray([0.0, 1.0, 0.0])))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_assign_bins_matches_digitize(rng):
    x = rng.uniform(0, 10, 1000).astype(np.float32)
    edges = np.linspace(0, 10, 11).astype(np.float32)
    idx, valid = ops.assign_bins(jnp.asarray(x), jnp.asarray(edges))
    expected = np.clip(np.digitize(x, edges) - 1, 0, 9)
    np.testing.assert_array_equal(np.asarray(idx), expected)
    assert bool(jnp.all(valid))


def test_segment_stats_match_numpy(rng):
    n, nbins = 5000, 16
    x = rng.normal(size=n).astype(np.float32)
    w = rng.uniform(0.5, 2, n).astype(np.float32)
    seg = rng.integers(0, nbins, n)
    for stat in ["sum", "mean", "rms", "disp", "min", "max"]:
        got = np.asarray(ops.segment_stat(jnp.asarray(x), jnp.asarray(seg),
                                          nbins, stat, weights=jnp.asarray(w)))
        for b in range(nbins):
            sel = seg == b
            if stat == "sum":
                exp = x[sel].sum()
            elif stat == "mean":
                exp = np.average(x[sel], weights=w[sel])
            elif stat == "rms":
                exp = np.sqrt(np.average(x[sel] ** 2, weights=w[sel]))
            elif stat == "disp":
                m1 = np.average(x[sel], weights=w[sel])
                m2 = np.average(x[sel] ** 2, weights=w[sel])
                exp = np.sqrt(max(m2 - m1 * m1, 0))
            elif stat == "min":
                exp = x[sel].min()
            elif stat == "max":
                exp = x[sel].max()
            assert got[b] == pytest.approx(exp, rel=1e-3, abs=1e-5), stat


def test_segment_weighted_quantile_matches_per_bin(rng):
    n, nbins = 8000, 12
    x = rng.normal(size=n).astype(np.float32)
    w = rng.uniform(0.5, 2, n).astype(np.float32)
    seg = rng.integers(0, nbins, n)
    mask = rng.uniform(size=n) > 0.2
    fracs = np.array([0.16, 0.5, 0.84], dtype=np.float32)
    got = np.asarray(ops.segment_weighted_quantile(
        jnp.asarray(x), jnp.asarray(seg), nbins, jnp.asarray(fracs),
        weights=jnp.asarray(w), mask=jnp.asarray(mask)))
    for b in range(nbins):
        sel = (seg == b) & mask
        exp = _np_weighted_quantile(x[sel], w[sel], fracs, shift_first=False)
        np.testing.assert_allclose(got[:, b], exp, rtol=1e-3, atol=1e-4)


def test_radius_at_surface_density_total(rng):
    # uniform surface-density disk: Σ(<r) = Σ0 for all r → pick target Σ0/2
    # use a power-law so Σ(<r) is monotonic: m uniform, r ~ sqrt(u) gives
    # uniform Σ; make Σ decline with r by r ~ u**0.7
    n = 20000
    r = (rng.uniform(0, 1, n) ** 0.7 * 10).astype(np.float32)
    m = np.full(n, 1.0, dtype=np.float32)
    # numpy reference for mode="total"
    rs = np.sort(r)
    mc = np.cumsum(np.ones_like(rs))
    def sigma(rv):
        k = np.searchsorted(rs, rv, side="right")
        return (mc[k - 1] if k > 0 else 0.0) / (np.pi * rv ** 2)
    target = sigma(5.0)
    got = float(ops.radius_at_surface_density(
        jnp.asarray(r), jnp.asarray(m), target, mode="total"))
    assert got == pytest.approx(5.0, rel=0.02)


def test_virial_radius(rng):
    # Hernquist-ish: M(<r) known analytically via sampled cumsum
    n = 50000
    u = rng.uniform(0.001, 0.9, n)
    r = (np.sqrt(u) / (1 - np.sqrt(u))).astype(np.float32)  # a=1
    m = np.full(n, 1.0, dtype=np.float32)
    rs = np.sort(r)
    mc = np.cumsum(np.ones_like(rs))
    rho = mc / (4 / 3 * np.pi * rs ** 3)
    target = float(rho[len(rho) // 2])
    exp = rs[len(rho) // 2]
    got = float(ops.virial_radius(jnp.asarray(r), jnp.asarray(m), target))
    assert got == pytest.approx(float(exp), rel=0.01)


def test_segment_weighted_quantile_fully_masked_segment():
    """A segment whose entries are all masked must return NaN, not the -inf
    padding value (round-1 advisor finding)."""
    vals = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    segs = np.array([0, 0, 0, 1])
    mask = np.array([True, True, True, False])
    got = np.asarray(ops.segment_weighted_quantile(
        vals, segs, 2, 0.5, mask=mask))
    unmasked = np.asarray(ops.segment_weighted_quantile(
        vals[:3], segs[:3], 1, 0.5))
    assert got[0] == pytest.approx(float(unmasked[0]))
    assert np.isnan(got[1])
