"""Sharded analysis engine (SURVEY §7 step 6; VERDICT round-1 item 5).

The TPU-native design shards the particle axis with a NamedSharding and
lets GSPMD insert the collectives: segment reductions become local
segment-sums + psum, the one-sort weighted quantiles run on XLA's
distributed sort, and the ssc while_loop's masked reductions psum per
iteration.  These tests pin 8-virtual-device results to single-device
results (the reference's chunked-dask path covered all calculators the
same way, ``chunk/chunksnap.py:84-121``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import pynbodyext_tpu as px
from pynbodyext_tpu import ops
from pynbodyext_tpu.parallel import make_mesh, shard_snapshot


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh()


def _shard(mesh, x):
    spec = P("p") if np.ndim(x) == 1 else P("p", *([None] * (x.ndim - 1)))
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


@pytest.fixture(scope="module")
def particles(mesh):
    rng = np.random.default_rng(7)
    n = 40_000  # divisible by 8
    vals = rng.normal(0, 5, n).astype(np.float32)
    segs = rng.integers(0, 24, n).astype(np.int32)
    w = rng.uniform(0.5, 2, n).astype(np.float32)
    mask = rng.uniform(size=n) < 0.8
    return vals, segs, w, mask


@pytest.mark.parametrize("stat", ["sum", "mean", "disp", "min", "max",
                                  "rms", "sum_w"])
def test_sharded_segment_stats(mesh, particles, stat):
    vals, segs, w, mask = particles
    ref = np.asarray(ops.segment_stat(jnp.asarray(vals), jnp.asarray(segs),
                                      24, stat, weights=jnp.asarray(w),
                                      mask=jnp.asarray(mask)))
    got = np.asarray(ops.segment_stat(_shard(mesh, vals), _shard(mesh, segs),
                                      24, stat, weights=_shard(mesh, w),
                                      mask=_shard(mesh, mask)))
    # f32 psum reordering across shards costs ~5e-6; the 1e-6 bar is pinned
    # in f64 below
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sharded_segment_stats_f64_exact(mesh, particles):
    vals, segs, w, mask = particles
    with jax.enable_x64():
        v64 = jnp.asarray(np.asarray(vals), jnp.float64)
        w64 = jnp.asarray(np.asarray(w), jnp.float64)
        ref = np.asarray(ops.segment_stat(v64, jnp.asarray(segs), 24,
                                          "mean", weights=w64,
                                          mask=jnp.asarray(mask)))
        got = np.asarray(ops.segment_stat(_shard(mesh, np.asarray(v64)),
                                          _shard(mesh, segs), 24, "mean",
                                          weights=_shard(mesh, np.asarray(w64)),
                                          mask=_shard(mesh, mask)))
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_sharded_weighted_quantile(mesh, particles):
    """Per-segment weighted quantiles under GSPMD (distributed sort).

    In f64 the sharded result matches single-device to ~1e-11 (the sort and
    weighted-CDF interp are order-exact); in f32 the global cumsum's
    reassociation costs ~1e-3 relative on interpolated values — inherent to
    the f32 weighted CDF, not the sharding."""
    vals, segs, w, mask = particles
    fr = np.asarray([0.16, 0.5, 0.84], np.float32)
    ref = np.asarray(ops.segment_weighted_quantile(
        jnp.asarray(vals), jnp.asarray(segs), 24, fr,
        weights=jnp.asarray(w), mask=jnp.asarray(mask)))
    got = np.asarray(ops.segment_weighted_quantile(
        _shard(mesh, vals), _shard(mesh, segs), 24, fr,
        weights=_shard(mesh, w), mask=_shard(mesh, mask)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    with jax.enable_x64():
        v64, w64 = np.asarray(vals, np.float64), np.asarray(w, np.float64)
        ref64 = np.asarray(ops.segment_weighted_quantile(
            jnp.asarray(v64), jnp.asarray(segs), 24,
            np.asarray(fr, np.float64), weights=jnp.asarray(w64),
            mask=jnp.asarray(mask)))
        got64 = np.asarray(ops.segment_weighted_quantile(
            _shard(mesh, v64), _shard(mesh, segs), 24,
            np.asarray(fr, np.float64), weights=_shard(mesh, w64),
            mask=_shard(mesh, mask)))
    np.testing.assert_allclose(got64, ref64, rtol=1e-10)


def test_sharded_ssc(mesh):
    rng = np.random.default_rng(3)
    n = 80_000
    r = rng.exponential(2.0, n).astype(np.float32)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pos = v * r[:, None] + np.float32(100.0)
    m = rng.uniform(0.5, 2, n).astype(np.float32)
    ref = np.asarray(ops.shrink_sphere_center(jnp.asarray(pos),
                                              weights=jnp.asarray(m)))
    got = np.asarray(ops.shrink_sphere_center(_shard(mesh, pos),
                                              weights=_shard(mesh, m)))
    assert np.linalg.norm(got - ref) < 1e-4 * np.median(r)
    # ladder variant under sharding too
    got_l = np.asarray(ops.shrink_sphere_center(
        _shard(mesh, pos), weights=_shard(mesh, m), coarse_stride=8))
    assert np.linalg.norm(got_l - ref) < 1e-4 * np.median(r)


def test_sharded_profile_percentiles(mesh, centered_snap):
    """RadialProfile equaln edges + percentile arrays on a particle-sharded
    snapshot match the unsharded profile (the reference ran all profiles
    through dask chunks; here GSPMD shards the same code)."""
    from pynbodyext_tpu.profiles import RadialProfile
    # pad to a multiple of 8 is unnecessary: GSPMD handles uneven shards
    sharded = shard_snapshot(centered_snap, mesh)
    # lin bins: edges depend only on min/max → sharded assignment is exact
    pr_ref = RadialProfile(centered_snap, ndim=3, nbins=16, bins_type="lin")
    pr_sh = RadialProfile(sharded, ndim=3, nbins=16, bins_type="lin")
    for key in ("mass_sum", "vr_p16", "vr_med", "density"):
        a = np.asarray(pr_ref[key], np.float64)
        b = np.asarray(pr_sh[key], np.float64)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6,
                                   equal_nan=True)
    # equaln bins: edges are f32 quantiles — sharded cumsum reassociation
    # jitters edges by ~1 particle, so per-bin sums can differ by a particle
    pe_ref = RadialProfile(centered_snap, ndim=3, nbins=16,
                           bins_type="equaln")
    pe_sh = RadialProfile(sharded, ndim=3, nbins=16, bins_type="equaln")
    npart_ref = np.asarray(pe_ref.npart_bins, np.float64)
    npart_sh = np.asarray(pe_sh.npart_bins, np.float64)
    assert np.abs(npart_sh - npart_ref).max() <= 2
    np.testing.assert_allclose(np.asarray(pe_sh["vr_med"], np.float64),
                               np.asarray(pe_ref["vr_med"], np.float64),
                               rtol=5e-3, atol=0.5)


def test_sharded_full_engine_kappa(mesh, centered_snap):
    """The full calculator-engine KappaRot pipeline on a sharded snapshot
    matches the unsharded run (every reduction psums over the mesh)."""
    sharded = shard_snapshot(centered_snap, mesh)
    sel = px.Sphere(30.0) & px.FamilyFilter("star")
    chain = (px.ShiftPosTo("ssc")
             .then(px.ShiftVelTo("com").measure_with(sel))
             .then(px.AlignVec(px.AngMomVec()).measure_with(sel)))
    k_ref = float(px.KappaRot().transform(chain).filter(sel)(centered_snap))
    k_sh = float(px.KappaRot().transform(chain).filter(sel)(sharded))
    assert k_sh == pytest.approx(k_ref, rel=1e-5)
