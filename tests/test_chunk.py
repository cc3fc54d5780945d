"""Chunked out-of-core execution (mirrors reference
calculate_init_test.py:115-122: chunked vs plain mass sum)."""

import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.chunk import (ChunkedSnapshot, HDF5ChunkStore,
                                  StreamingArray,
                                  is_streaming_array)


@pytest.fixture(scope="module")
def chunked(centered_snap):
    return ChunkedSnapshot(centered_snap, chunk_size=1000)  # 9 chunks


def test_chunked_vs_plain_sum(chunked, centered_snap):
    plain = float(px.ParamSum("mass")(centered_snap).value)
    streamed = float(chunked["mass"].sum().value)
    assert streamed == pytest.approx(plain, rel=1e-6)


def test_chunk_count(chunked):
    assert chunked.n_chunks == 9
    assert len(chunked) == 9000


def test_family_view_sum(chunked, centered_snap):
    star_plain = float(px.ParamSum("mass").filter(
        px.FamilyFilter("star"))(centered_snap).value)
    star_streamed = float(chunked.s["mass"].sum().value)
    assert star_streamed == pytest.approx(star_plain, rel=1e-6)
    assert len(chunked.s) == 3000


def test_streaming_elementwise(chunked, centered_snap):
    ke_lazy = (chunked["vel"] * chunked["vel"]).sum()
    exp = float(np.sum(np.asarray(centered_snap["vel"],
                                  dtype=np.float64) ** 2))
    got = float(np.asarray(ke_lazy.value).sum())
    assert got == pytest.approx(exp, rel=1e-5)
    assert ke_lazy.units == px.parse_unit("km**2 s**-2")


def test_streaming_minmax_mean(chunked, centered_snap):
    temp = chunked["temp"]
    assert float(temp.max().value) == pytest.approx(
        float(np.asarray(centered_snap["temp"]).max()))
    assert float(temp.min().value) == pytest.approx(
        float(np.asarray(centered_snap["temp"]).min()))


def test_compute_materializes(chunked, centered_snap):
    full = chunked["mass"].compute()
    np.testing.assert_allclose(np.asarray(full),
                               np.asarray(centered_snap["mass"]))
    assert is_streaming_array(chunked["mass"])
    assert not is_streaming_array(full)


def test_in_units_lazy(chunked):
    pc = chunked["pos"].in_units("pc")
    assert float(pc.max().value) == pytest.approx(
        float(chunked["pos"].max().value) * 1000.0, rel=1e-6)


def test_map_reduce(chunked, centered_snap):
    import jax.numpy as jnp
    total = chunked.map_reduce(
        ["mass", "pos"],
        lambda m, p: jnp.sum(m[:, None] * p, axis=0),
        lambda a, b: a + b, 0.0)
    m = np.asarray(centered_snap["mass"], dtype=np.float64)
    p = np.asarray(centered_snap["pos"], dtype=np.float64)
    np.testing.assert_allclose(np.asarray(total), (m[:, None] * p).sum(0),
                               rtol=1e-4)


def test_materialize_runs_full_engine(chunked, centered_snap):
    snap2 = chunked.materialize(["mass", "pos", "vel"])
    k1 = float(px.KappaRot().filter(px.FamilyFilter("star"))(snap2))
    k2 = float(px.KappaRot().filter(px.FamilyFilter("star"))(centered_snap))
    assert k1 == pytest.approx(k2, rel=1e-5)


def test_hdf5_chunk_store(tmp_path, centered_snap):
    """True out-of-core: HDF5-backed store reads slices, sums match."""
    path = str(tmp_path / "chunks.hdf5")
    px.save_gadget_hdf5(centered_snap, path)
    cs = ChunkedSnapshot(HDF5ChunkStore(path, chunk_size=700))
    assert cs.store.n_total == len(centered_snap)
    got = float(cs["mass"].sum().value)
    exp = float(np.asarray(centered_snap["mass"], dtype=np.float64).sum())
    assert got == pytest.approx(exp, rel=1e-6)
    # slice-consistency of a multi-column field
    pos_sum = np.asarray(cs["pos"].sum().value)
    exp_pos = np.asarray(centered_snap["pos"], dtype=np.float64).sum(0)
    np.testing.assert_allclose(pos_sum, exp_pos, rtol=1e-4)


def test_family_view_exact_reductions(chunked, centered_snap):
    """min/mean/max over a family view must equal the materialized family
    values — the round-1 zero-fill bug silently included zeros."""
    sv = chunked.s["vr"]
    star = np.asarray(centered_snap.family_mask("star"))
    full = np.asarray(centered_snap["vr"].value)[star]
    assert float(sv.mean().value) == pytest.approx(full.mean(), rel=1e-6)
    assert float(sv.min().value) == pytest.approx(full.min(), rel=1e-6)
    assert float(sv.max().value) == pytest.approx(full.max(), rel=1e-6)
    assert sv.count() == len(full)
    assert len(sv) == len(full)
    got = np.asarray(sv.compute().value)
    np.testing.assert_allclose(got, full, rtol=1e-6)


def test_family_view_binop_keeps_mask(chunked, centered_snap):
    ke = chunked.s["vr"] * chunked.s["vr"]
    star = np.asarray(centered_snap.family_mask("star"))
    full = np.asarray(centered_snap["vr"].value)[star]
    assert float(ke.mean().value) == pytest.approx((full * full).mean(),
                                                   rel=1e-6)


def test_filtered_view(chunked, centered_snap):
    import jax.numpy as jnp
    store = chunked.store

    def mask_fn(i):
        r = jnp.asarray(store.load_chunk("pos", i))
        return jnp.sum(r * r, axis=1) < 25.0
    view = chunked.filtered(mask_fn)
    pos = np.asarray(centered_snap["pos"].value)
    mass = np.asarray(centered_snap["mass"].value)
    inside = (pos ** 2).sum(1) < 25.0
    assert float(view["mass"].sum().value) == pytest.approx(
        mass[inside].sum(), rel=1e-6)
    assert float(view["mass"].mean().value) == pytest.approx(
        mass[inside].mean(), rel=1e-6)
    # filter composes with family view
    star = centered_snap.family_mask("star")
    both = np.logical_and(inside, np.asarray(star))
    assert float(view.s["mass"].sum().value) == pytest.approx(
        mass[both].sum(), rel=1e-6)


def test_profile_consumes_streaming_input(chunked, centered_snap):
    """Profiles accept StreamingArray fields by computing them on entry
    (reference dask path, ``proarray.py:316``)."""
    from pynbodyext_tpu.profiles import RadialProfile
    base = chunked.materialize(["pos", "mass"])
    sv = chunked["vr"]  # streaming field, NOT materialized above

    class StreamingSim:
        """Snapshot facade whose 'vr' field is a live StreamingArray."""
        def __init__(self, b, s):
            self._b, self._s = b, s

        def __getitem__(self, k):
            return self._s if k == "vr" else self._b[k]

        def __getattr__(self, a):
            return getattr(self._b, a)

    pr = RadialProfile(StreamingSim(base, sv), ndim=3, nbins=10,
                       bins_type="lin")
    got = np.asarray(pr["vr"])
    pr_ref = RadialProfile(centered_snap, ndim=3, nbins=10, bins_type="lin")
    np.testing.assert_allclose(got, np.asarray(pr_ref["vr"]), rtol=1e-5)
    # with_fields also computes streaming inputs
    snap2 = base.with_fields(vr=chunked["vr"])
    np.testing.assert_allclose(np.asarray(snap2["vr"].value),
                               np.asarray(centered_snap["vr"].value),
                               rtol=1e-6)


def test_map_reduce_sharded(chunked, centered_snap):
    """Out-of-core over the host axis + data-parallel over the device mesh
    (the reference's remote-dask-workers analogue, chunk.py:124-151)."""
    import jax
    import jax.numpy as jnp
    from pynbodyext_tpu.parallel import make_mesh
    mesh = make_mesh()
    total = chunked.map_reduce(
        ["mass", "pos"],
        jax.jit(lambda m, p: jnp.sum(m[:, None] * p, axis=0)),
        lambda a, b: a + b, 0.0, mesh=mesh)
    m = np.asarray(centered_snap["mass"], dtype=np.float64)
    p = np.asarray(centered_snap["pos"], dtype=np.float64)
    np.testing.assert_allclose(np.asarray(total), (m[:, None] * p).sum(0),
                               rtol=1e-4)


# ---------------------------------------------------------------------------
# Round 3: calculator ENGINE on chunked snapshots — no materialize
# (reference: every calculator runs on dask-lazy ChunkSimSnap,
# chunksnap.py:84-123)
# ---------------------------------------------------------------------------

def test_derived_fields_stream(chunked, centered_snap):
    r = chunked["r"]
    assert is_streaming_array(r)
    ref = np.linalg.norm(np.asarray(centered_snap["pos"]), axis=1)
    assert float(r.max().value) == pytest.approx(float(ref.max()), rel=1e-6)
    assert float(r.sum().value) == pytest.approx(float(ref.sum()), rel=1e-6)
    # derived of derived (ke) + family view composition
    ke_s = chunked.s["ke"].sum()
    sl = centered_snap.family_slices["star"]
    vel = np.asarray(centered_snap["vel"], dtype=np.float64)[sl]
    assert float(ke_s.value) == pytest.approx(
        0.5 * float((vel ** 2).sum()), rel=1e-5)


def test_engine_param_sum_with_filters(chunked, centered_snap):
    calc = px.ParamSum("mass").filter(px.FamilyFilter("star"))
    got = float(calc(chunked).value)
    ref = float(calc(centered_snap).value)
    assert got == pytest.approx(ref, rel=1e-6)
    # combined filter: Sphere & FamilyFilter through the engine
    calc2 = px.ParamSum("mass").filter(
        px.Sphere(3.0) & px.FamilyFilter("star"))
    got2 = float(calc2(chunked).value)
    ref2 = float(calc2(centered_snap).value)
    assert 0 < got2 < ref
    assert got2 == pytest.approx(ref2, rel=1e-6)
    # negation
    calc3 = px.ParamSum("mass").filter(~px.FamilyFilter("star"))
    assert float(calc3(chunked).value) == pytest.approx(
        float(calc3(centered_snap).value), rel=1e-6)


def test_engine_param_contain_chunked(chunked, centered_snap):
    calc = px.ParamContain("r", 0.5, "mass").filter(px.FamilyFilter("star"))
    got = float(calc(chunked).value)
    ref = float(calc(centered_snap).value)
    assert got == pytest.approx(ref, rel=1e-5)


def test_engine_centers_chunked(chunked, centered_snap):
    for calc in (px.CenPos("com"), px.CenVel("com"), px.AngMomVec()):
        got = np.asarray(calc(chunked).value)
        ref = np.asarray(calc(centered_snap).value)
        np.testing.assert_allclose(got, ref, rtol=2e-5,
                                   atol=np.abs(ref).max() * 1e-5)


def test_streaming_radial_profile_matches(chunked, centered_snap):
    from pynbodyext_tpu.profiles import RadialProfile
    pr_ref = RadialProfile(centered_snap, ndim=3, weight="mass", nbins=12,
                           bin_min=0.1, bin_max=8.0)
    pr_str = RadialProfile(chunked, ndim=3, weight="mass", nbins=12,
                           bin_min=0.1, bin_max=8.0)
    np.testing.assert_allclose(np.asarray(pr_str.rbins.value),
                               np.asarray(pr_ref.rbins.value), rtol=1e-6)
    np.testing.assert_array_equal(pr_str.npart_bins, pr_ref.npart_bins)
    for expr in ("density", "mass_enc"):
        a = np.asarray(pr_str[expr].value)
        b = np.asarray(pr_ref[expr].value)
        np.testing.assert_allclose(a, b, rtol=2e-5, err_msg=expr)
    # weighted mean + dispersion of a derived field
    np.testing.assert_allclose(np.asarray(pr_str["vr"].value),
                               np.asarray(pr_ref["vr"].value),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pr_str["vr"]["disp"].value),
                               np.asarray(pr_ref["vr"]["disp"].value),
                               rtol=2e-3, atol=1e-4)
    # family subprofile
    np.testing.assert_array_equal(pr_str.s.npart_bins, pr_ref.s.npart_bins)


def test_streaming_rank_statistics_match(chunked, centered_snap):
    """Streamed histogram-bisection percentiles match the in-HBM sorted
    quantiles on a ≥3-chunk snapshot (VERDICT r3 §next-5; reference
    materializes instead, proarray.py:316-334)."""
    from pynbodyext_tpu.profiles import RadialProfile
    pr_ref = RadialProfile(centered_snap, ndim=3, weight="mass", nbins=12,
                           bin_min=0.1, bin_max=8.0)
    pr_str = RadialProfile(chunked, ndim=3, weight="mass", nbins=12,
                           bin_min=0.1, bin_max=8.0)
    assert pr_str.sim.n_chunks >= 3
    scale = float(np.nanmax(np.abs(np.asarray(pr_ref["vr"]["med"].value))))
    for stat in ("p16", "med", "p50", "p84"):
        a = np.asarray(pr_str["vr"][stat].value)
        b = np.asarray(pr_ref["vr"][stat].value)
        assert np.isnan(a).tolist() == np.isnan(b).tolist()
        # documented tolerance: exact local resolve up to f32
        # accumulation-order noise in the streamed CDF masses
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b),
                                   rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=stat)
    # unweighted profile takes the same path
    pu_ref = RadialProfile(centered_snap, ndim=3, weight=None, nbins=8,
                           bin_min=0.1, bin_max=8.0)
    pu_str = RadialProfile(chunked, ndim=3, weight=None, nbins=8,
                           bin_min=0.1, bin_max=8.0)
    a = np.asarray(pu_str["vr"]["p30"].value)
    b = np.asarray(pu_ref["vr"]["p30"].value)
    np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b),
                               rtol=2e-4, atol=2e-4 * scale)


def test_streaming_equaln_bins_match(chunked, centered_snap):
    """Streamed equal-count edges (histogram bisection, no
    materialization) match the in-HBM equaln profile on a ≥3-chunk
    snapshot (VERDICT r4 item 6; reference materializes the dask array to
    sort it — proarray.py:316-334, bins.py:720-746)."""
    from pynbodyext_tpu.profiles import Profile
    from pynbodyext_tpu.profiles.bins import BinsSet

    bs = BinsSet(bins_by="r", bins_type="equaln", nbins=10,
                 bin_min=0.1, bin_max=8.0)
    pr_ref = Profile(centered_snap, weight="mass", bins_set=bs)
    pr_str = Profile(chunked, weight="mass", bins_set=bs)
    assert pr_str.sim.n_chunks >= 3
    er = np.asarray(pr_ref.bin_edges.value, np.float64)
    es = np.asarray(pr_str.bin_edges.value, np.float64)
    np.testing.assert_allclose(es, er, rtol=1e-4, atol=8.0 * 1e-5)
    # equal-count property: every bin holds ~N/nbins particles
    counts = np.asarray(pr_str.npart_bins, np.int64)
    assert counts.sum() == np.asarray(pr_ref.npart_bins).sum()
    assert np.abs(counts - counts.mean()).max() <= max(3, counts.mean() * 0.02)
    # statistics computed on those edges agree
    a = np.asarray(pr_str["vr"].value)
    b = np.asarray(pr_ref["vr"].value)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-3)


def test_streaming_callable_bins_by(chunked, centered_snap):
    """Callable bins_by evaluates per chunk view (BinsSet._resolve_x
    parity; previously rejected — VERDICT r4 item 6)."""
    from pynbodyext_tpu.profiles import Profile
    from pynbodyext_tpu.profiles.bins import BinsSet

    def half_r(view):
        return view["r"] * 0.5

    bs = BinsSet(bins_by=half_r, bins_type="lin", nbins=8,
                 bin_min=0.05, bin_max=4.0)
    pr_ref = Profile(centered_snap, weight="mass", bins_set=bs)
    pr_str = Profile(chunked, weight="mass", bins_set=bs)
    np.testing.assert_array_equal(pr_str.npart_bins, pr_ref.npart_bins)
    np.testing.assert_allclose(np.asarray(pr_str["vr"].value),
                               np.asarray(pr_ref["vr"].value),
                               rtol=2e-4, atol=1e-5)
    # auto min/max (streamed) path with a callable
    bs2 = BinsSet(bins_by=half_r, bins_type="lin", nbins=8)
    pr2_ref = Profile(centered_snap, weight="mass", bins_set=bs2)
    pr2_str = Profile(chunked, weight="mass", bins_set=bs2)
    np.testing.assert_allclose(
        np.asarray(pr2_str.bin_edges.value),
        np.asarray(pr2_ref.bin_edges.value), rtol=1e-5)


def test_streaming_equaln_edge_cases(centered_snap):
    """Streamed equal-N edges under degenerate inputs: massive value
    ties (documented midpoint tolerance), nbins=1, and an empty
    selection (lin-edges fallback) must not raise or return NaN."""
    from pynbodyext_tpu.chunk import ChunkedSnapshot, StreamingProfile

    chunked = ChunkedSnapshot(centered_snap, chunk_size=700)
    # nbins=1: edges are just the masked extrema
    p1 = StreamingProfile(chunked, bins_by="r", bins_type="equaln",
                          nbins=1, weight="mass")
    e1 = np.asarray(p1.bin_edges.value)
    assert e1.shape == (2,) and np.isfinite(e1).all() and e1[0] < e1[1]
    assert int(np.asarray(p1.npart_bins).sum()) > 0
    # heavy ties: bin on a coordinate quantized to 4 distinct values
    def quant(view):
        return (view["r"] * 0.0) + np.float32(1.0)  # all-equal coordinate
    pq = StreamingProfile(chunked, bins_by=quant, bins_type="equaln",
                          nbins=4, weight=None)
    eq = np.asarray(pq.bin_edges.value)
    assert np.isfinite(eq).all()
    assert (np.diff(eq) >= 0).all()  # monotone under total ties
    # empty selection via an impossible range
    pe = StreamingProfile(chunked, bins_by="r", bins_type="equaln",
                          nbins=5, bin_min=1e9, bin_max=2e9, weight="mass")
    ee = np.asarray(pe.bin_edges.value)
    assert ee.shape == (6,) and np.isfinite(ee).all()
    assert int(np.asarray(pe.npart_bins).sum()) == 0
