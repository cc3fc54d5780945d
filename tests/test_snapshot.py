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
