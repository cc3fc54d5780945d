"""Transform tests: purity (no mutation), chains, measure_with, wrap
conventions (mirrors reference transform_test.py + calculate_init_test
revert invariants, SURVEY.md §4)."""

import numpy as np
import pytest

import pynbodyext_tpu as px


def test_shift_pos_pure(snap):
    """The original snapshot is never mutated (functional 'revert')."""
    before = np.asarray(snap["pos"]).copy()
    shifted = px.ShiftPosTo("ssc").apply_to(snap)
    after = np.asarray(snap["pos"])
    np.testing.assert_array_equal(before, after)
    assert not np.allclose(np.asarray(shifted["pos"]), before)


def test_shift_pos_explicit_array(centered_snap):
    t = px.ShiftPosTo(np.array([1.0, 2.0, 3.0], dtype=np.float32))
    out = t.apply_to(centered_snap)
    np.testing.assert_allclose(np.asarray(out["pos"]),
                               np.asarray(centered_snap["pos"])
                               - np.array([1, 2, 3], dtype=np.float32),
                               rtol=1e-6)


def test_shift_modes_validate():
    with pytest.raises(ValueError):
        px.ShiftPosTo("bogus")
    with pytest.raises(ValueError):
        px.ShiftVelTo("ssc")


def test_shift_vel_com(snap):
    out = px.ShiftVelTo("com").apply_to(snap)
    m = np.asarray(snap["mass"], dtype=np.float64)
    v = np.asarray(out["vel"], dtype=np.float64)
    com_v = (v * m[:, None]).sum(0) / m.sum()
    np.testing.assert_allclose(com_v, 0.0, atol=1e-3)


def test_wrap_center_convention(snap):
    out = px.WrapBox(convention="center").apply_to(snap)
    p = np.asarray(out["pos"])
    assert p.min() >= -250.0 and p.max() < 250.0


def test_wrap_upper_convention(snap):
    out = px.WrapBox(convention="upper").apply_to(snap)
    p = np.asarray(out["pos"])
    assert p.min() >= 0.0 and p.max() < 500.0


def test_wrap_minirange_picks_smaller_range(snap):
    """Galaxy at box center: both conventions equivalent → ranges equal;
    galaxy at box corner: minirange must choose 'center' wrapping."""
    corner = px.make_test_galaxy(500, 500, 1000, seed=3,
                                 center=(0.0, 0.0, 0.0), wrapped=True)
    out = px.WrapBox(convention="minirange").apply_to(corner)
    p = np.asarray(out["pos"])
    # object straddling the origin must be reassembled compactly
    assert p.max() - p.min() < 450.0
    assert np.abs(np.median(p, axis=0)).max() < 50.0


def test_wrap_noop_without_boxsize(centered_snap):
    nobox = centered_snap.with_properties(boxsize=None)
    nobox.properties.pop("boxsize")
    out = px.WrapBox().apply_to(nobox)
    np.testing.assert_array_equal(np.asarray(out["pos"]),
                                  np.asarray(nobox["pos"]))


def test_align_vec(centered_snap):
    out = px.AlignVec(np.array([1.0, 0.0, 0.0])).apply_to(centered_snap)
    # x-axis becomes z-axis: new z == old x
    np.testing.assert_allclose(np.asarray(out["pos"])[:, 2],
                               np.asarray(centered_snap["pos"])[:, 0],
                               rtol=1e-5, atol=1e-4)
    # rotation is rigid: radii preserved
    np.testing.assert_allclose(np.asarray(out["r"]),
                               np.asarray(centered_snap["r"]),
                               rtol=1e-4, atol=1e-3)


def test_align_angmom_faceon(centered_snap):
    """After aligning the stellar angular momentum, J points along +z."""
    sel = px.FamilyFilter("star")
    out = px.AlignVec(px.AngMomVec()).measure_with(sel).apply_to(centered_snap)
    J = np.asarray(px.AngMomVec().filter(sel)(out).value)
    J = J / np.linalg.norm(J)
    np.testing.assert_allclose(J, [0, 0, 1], atol=1e-4)


def test_chain_order_semantics(snap):
    """Chain steps see successive frames (reference transforms.py:424-443)."""
    chain = px.WrapBox(convention="minirange").then(px.ShiftPosTo("ssc"))
    out = chain.apply_to(snap)
    # center of final frame ≈ origin
    cen = np.asarray(px.CenPos("ssc")(out).value)
    np.testing.assert_allclose(cen, 0.0, atol=0.5)


def test_measure_with_scoped_params(snap):
    """measure_with: params measured on the subset, transform applied to all
    (reference transforms.py:227)."""
    sel = px.Sphere("30 kpc") & px.FamilyFilter("star")
    chain = (px.WrapBox(convention="minirange")
             .then(px.ShiftPosTo("ssc"))
             .then(px.ShiftVelTo("com").measure_with(sel)))
    out = chain.apply_to(snap)
    # star com velocity ≈ 0 (measured on stars), and it moved everything:
    m = np.asarray(out["mass"], dtype=np.float64)
    v = np.asarray(out["vel"], dtype=np.float64)
    sl = out.family_slices["star"]
    star_com = (v[sl] * m[sl, None]).sum(0) / m[sl].sum()
    np.testing.assert_allclose(star_com, 0.0, atol=1.0)


def test_transform_scope_reverts_outward(snap):
    """A transform inside a scope does not leak: outer nodes see the
    original frame (the reference's revert invariant)."""
    inner = px.ParamSum("mass").transform(px.ShiftPosTo("ssc")).filter(
        px.Sphere(10.0))
    outer = px.ParamSum("mass").filter(px.Sphere(10.0))
    r_inner = float(inner(snap).value)
    r_outer = float(outer(snap).value)
    # centered sphere selects the galaxy; uncentered misses it
    assert r_inner > r_outer
    # and the original snapshot itself is untouched
    assert float(px.ParamSum("mass")(snap).value) == pytest.approx(1.38e11,
                                                                   rel=1e-4)
