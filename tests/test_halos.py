"""Halo catalog tests (the reference's subfind-halo workflows as masks)."""

import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.snap import HaloCatalog


@pytest.fixture(scope="module")
def halo_snap():
    snap = px.make_test_galaxy(1000, 1000, 2000, seed=3,
                               center=(0.0, 0.0, 0.0), vsys=(0.0, 0.0, 0.0))
    # assign group ids: 4 halos by radius quartile, outskirts unassigned
    rng = np.random.default_rng(0)
    r = np.asarray(snap["r"])
    grp = np.full(len(snap), -1, dtype=np.int32)
    qs = np.quantile(r, [0.25, 0.5, 0.75, 0.9])
    grp[r < qs[0]] = 0
    grp[(r >= qs[0]) & (r < qs[1])] = 1
    grp[(r >= qs[1]) & (r < qs[2])] = 2
    grp[(r >= qs[2]) & (r < qs[3])] = 3
    return snap.with_fields(grp=grp.astype(np.int32)), grp


def test_catalog_counts(halo_snap):
    snap, grp = halo_snap
    cat = HaloCatalog(snap)
    assert len(cat) == 4
    for i in range(4):
        assert cat.counts[i] == (grp == i).sum()
        assert len(cat[i]) == (grp == i).sum()


def test_halo_views_compose(halo_snap):
    snap, grp = halo_snap
    cat = HaloCatalog(snap)
    halo0 = cat[0]
    # halos compose with calculators like any view
    m = float(px.ParamSum("mass")(halo0).value)
    exp = np.asarray(snap["mass"], dtype=np.float64)[grp == 0].sum()
    assert m == pytest.approx(exp, rel=1e-5)
    # and with family filters
    stars0 = halo0.families("star")
    sl = snap.family_slices["star"]
    assert len(stars0) == (grp[sl.start:sl.stop] == 0).sum()


def test_vectorized_halo_stats(halo_snap):
    snap, grp = halo_snap
    cat = HaloCatalog(snap)
    masses = np.asarray(cat.stat("mass", "sum"))
    m = np.asarray(snap["mass"], dtype=np.float64)
    for i in range(4):
        assert masses[i] == pytest.approx(m[grp == i].sum(), rel=1e-4)
    cens = np.asarray(cat.centers())
    pos = np.asarray(snap["pos"], dtype=np.float64)
    for i in range(4):
        exp = (pos[grp == i] * m[grp == i, None]).sum(0) / m[grp == i].sum()
        np.testing.assert_allclose(cens[i], exp, atol=1e-3)


def test_out_of_range(halo_snap):
    snap, _ = halo_snap
    cat = HaloCatalog(snap)
    with pytest.raises(IndexError):
        cat[99]
