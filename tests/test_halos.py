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


def test_subfind_catalog_roundtrip(tmp_path):
    """Synthetic fof_subhalo_tab → SubfindCatalog → HaloCatalog: masses,
    counts, and halo views match the construction (reference loads subfind
    via pynbody, conftest.py:45-56)."""
    import h5py
    import pynbodyext_tpu as px
    from pynbodyext_tpu.snap.subfind import load_subfind_hdf5

    rng = np.random.default_rng(4)
    # 3 groups; per type (gas=pt0, dm=pt1) lengths, fuzz at the end
    glen = np.array([[30, 50, 0, 0, 10, 0],
                     [20, 25, 0, 0, 5, 0],
                     [10, 15, 0, 0, 5, 0]], np.int64)
    slen = np.array([[25, 40, 0, 0, 8, 0],
                     [5, 10, 0, 0, 2, 0],
                     [20, 25, 0, 0, 5, 0],
                     [10, 15, 0, 0, 5, 0]], np.int64)
    sgrnr = np.array([0, 0, 1, 2], np.int64)
    path = str(tmp_path / "fof_subhalo_tab_000.hdf5")
    with h5py.File(path, "w") as f:
        hdr = f.create_group("Header")
        hdr.attrs["Time"] = 1.0
        hdr.attrs["Redshift"] = 0.0
        g = f.create_group("Group")
        g.create_dataset("GroupLenType", data=glen)
        s = f.create_group("Subhalo")
        s.create_dataset("SubhaloLenType", data=slen)
        s.create_dataset("SubhaloGrNr", data=sgrnr)

    cat = load_subfind_hdf5(path)
    assert cat.n_groups == 3 and cat.n_subhalos == 4

    # group-ordered snapshot: gas 70 grouped + 10 fuzz, dm 90 + 10,
    # star 20 + 4
    n_gas, n_dm, n_star = 80, 100, 24
    n = n_gas + n_dm + n_star
    fields = {"pos": px.QArray(rng.normal(0, 1, (n, 3)).astype(np.float32),
                               "kpc"),
              "mass": px.QArray(np.ones(n, np.float32), "Msol")}
    snap = px.Snapshot(fields, {"gas": slice(0, n_gas),
                                "dm": slice(n_gas, n_gas + n_dm),
                                "star": slice(n_gas + n_dm, n)},
                       {"a": 1.0, "h": 0.7})
    halos = cat.halos(snap)
    assert len(halos) == 3
    np.testing.assert_array_equal(halos.counts, [90, 50, 30])
    # masses per halo: one segment reduction
    msum = np.asarray(halos.stat("mass", "sum").value)
    np.testing.assert_allclose(msum, [90.0, 50.0, 30.0])
    # halo view composes with filters/engine
    m0 = float(px.ParamSum("mass")(halos[0]).value)
    assert m0 == pytest.approx(90.0)
    # subhalo catalog
    subs = cat.halos(snap, subhalos=True)
    assert len(subs) == 4
    np.testing.assert_array_equal(subs.counts, [73, 17, 50, 30])
    # mismatched snapshot → clear error
    bad = px.Snapshot(fields, {"gas": slice(0, 10), "dm": slice(10, n)},
                      {"a": 1.0, "h": 0.7})
    with pytest.raises(ValueError, match="mismatch"):
        cat.attach(bad)
