"""Snapshot model tests: SoA layout, families, derived fields, COW updates."""

import numpy as np
import jax.numpy as jnp
import pytest

import pynbodyext_tpu as px


def test_family_counts(snap):
    assert len(snap) == 25_000
    assert len(snap.s) == 5_000
    assert len(snap.g) == 8_000
    assert len(snap.dm) == 12_000
    # family partition covers everything
    assert len(snap.s) + len(snap.g) + len(snap.dm) == len(snap)


def test_component_views(snap):
    x = snap["x"]
    pos = snap["pos"]
    assert np.allclose(np.asarray(x), np.asarray(pos)[:, 0])
    assert x.units == pos.units


def test_derived_fields(centered_snap):
    s = centered_snap
    r = np.asarray(s["r"])
    pos = np.asarray(s["pos"])
    assert np.allclose(r, np.linalg.norm(pos, axis=1), rtol=1e-6)
    ke = np.asarray(s["ke"])
    vel = np.asarray(s["vel"])
    assert np.allclose(ke, 0.5 * (vel ** 2).sum(1), rtol=1e-6)
    jz = np.asarray(s["jz"])
    assert np.allclose(jz, pos[:, 0] * vel[:, 1] - pos[:, 1] * vel[:, 0],
                       rtol=1e-5, atol=1e-2)
    # units propagate
    assert s["jz"].units == s["pos"].units * s["vel"].units


def test_derived_cache(centered_snap):
    a = centered_snap["r"]
    b = centered_snap["r"]
    assert a is b  # cached per snapshot


def test_with_fields_cow(centered_snap):
    s2 = centered_snap.with_fields(
        pos=centered_snap["pos"] + px.QArray(np.float32(1.0), "kpc"))
    # original untouched (pure functional update)
    assert np.allclose(np.asarray(s2["pos"]),
                       np.asarray(centered_snap["pos"]) + 1.0)
    # untouched fields shared by reference
    assert s2["mass"].value is centered_snap["mass"].value
    # derived cache invalidated
    assert not np.allclose(np.asarray(s2["r"]),
                           np.asarray(centered_snap["r"]))


def test_mask_views_never_gather(snap):
    view = snap.s
    # full-length arrays + mask, no copy
    assert view["mass"].shape[0] == len(snap)
    assert int(jnp.sum(view.effective_mask)) == 5_000


def test_age_derived(centered_snap):
    age = np.asarray(centered_snap["age"])
    tform = np.asarray(centered_snap["tform"])
    sl = centered_snap.family_slices["star"]
    assert np.allclose(age[sl], 13.8 - tform[sl], rtol=1e-5)


def test_unknown_field_raises(snap):
    with pytest.raises(KeyError):
        snap["nope"]


def test_gadget_hdf5_roundtrip(tmp_path, centered_snap):
    path = str(tmp_path / "snap.hdf5")
    px.save_gadget_hdf5(centered_snap, path)
    loaded = px.load_gadget_hdf5(path)
    assert len(loaded) == len(centered_snap)
    assert set(loaded.family_slices) == set(centered_snap.family_slices)
    np.testing.assert_allclose(np.asarray(loaded["pos"]),
                               np.asarray(centered_snap["pos"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded["mass"]),
                               np.asarray(centered_snap["mass"]), rtol=1e-6)


def test_gadget_binary_roundtrip(tmp_path, centered_snap):
    """Classic Gadget binary (format 2): write → read → identical fields
    (reference reads binary gadget via pynbody, conftest.py:30-41)."""
    import pynbodyext_tpu as px
    path = str(tmp_path / "snap_fmt2.bin")
    px.save_gadget_binary(centered_snap, path, fmt=2)
    back = px.load_gadget_binary(path)
    assert len(back) == len(centered_snap)
    assert set(back.family_slices) == set(centered_snap.family_slices)
    for fam in ("gas", "dm", "star"):
        sl_a = centered_snap.family_slices[fam]
        sl_b = back.family_slices[fam]
        np.testing.assert_allclose(
            np.asarray(back["pos"].value[sl_b]),
            np.asarray(centered_snap["pos"].value[sl_a]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(back["mass"].value[sl_b]),
            np.asarray(centered_snap["mass"].value[sl_a]), rtol=1e-6)
    # gas-only block
    gsl_a = centered_snap.family_slices["gas"]
    gsl_b = back.family_slices["gas"]
    np.testing.assert_allclose(np.asarray(back["rho"].value[gsl_b]),
                               np.asarray(centered_snap["rho"].value[gsl_a]),
                               rtol=1e-6)


def test_gadget_binary_format1(tmp_path, centered_snap):
    import pynbodyext_tpu as px
    path = str(tmp_path / "snap_fmt1.bin")
    px.save_gadget_binary(centered_snap, path, fmt=1)
    back = px.load_gadget_binary(path)
    np.testing.assert_allclose(np.asarray(back["vel"].value).sum(0),
                               np.asarray(centered_snap["vel"].value).sum(0),
                               rtol=1e-5)


def test_pynbody_adapter_with_fake_sim():
    """from_pynbody drives the adapter through a minimal SimSnap facade
    (pynbody itself is absent in this image; with it + the reference data
    present this adapter is the numeric-parity bridge)."""
    import pynbodyext_tpu as px

    class FakeArr(np.ndarray):
        units = "kpc"

    class FakeFam:
        def __init__(self, name):
            self.name = name

    class FakeSub:
        def __init__(self, n, seed):
            rng = np.random.default_rng(seed)
            self._d = {"pos": rng.normal(0, 1, (n, 3)),
                       "vel": rng.normal(0, 10, (n, 3)),
                       "mass": rng.uniform(1, 2, n)}
            self._n = n

        def loadable_keys(self):
            return list(self._d)

        def keys(self):
            return list(self._d)

        def __len__(self):
            return self._n

        def __getitem__(self, k):
            return self._d[k]

    class FakeSim:
        properties = {"a": 1.0, "h": 0.7, "time": 13.0}

        def __init__(self):
            self._fams = {"gas": FakeSub(50, 1), "star": FakeSub(30, 2)}

        def families(self):
            return [FakeFam(k) for k in self._fams]

        def __getitem__(self, f):
            if isinstance(f, FakeFam):
                return self._fams[f.name]
            if f == "pos":  # unit probe
                return self._fams["gas"]._d["pos"]
            raise KeyError(f)

    snap = px.from_pynbody(FakeSim())
    assert len(snap) == 80
    assert set(snap.family_slices) == {"gas", "star"}
    m = float(px.ParamSum("mass")(snap).value)
    exp = sum(s._d["mass"].sum() for s in FakeSim()._fams.values())
    assert m == pytest.approx(exp, rel=1e-6)
