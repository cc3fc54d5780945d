"""Device-evaluated Barnes–Hut (tree_tpu): interaction lists from the native
tree, batched dense evaluation on the accelerator."""

import numpy as np
import pytest

from pynbodyext_tpu.gravity.tree import (Octree, native_direct_accelerations,
                                         native_direct_potentials)
from pynbodyext_tpu.gravity.tree_tpu import (prepare_tree_device,
                                             tree_accelerations_device,
                                             tree_potentials_device)


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(1)
    n = 2000  # kept small: CPU interpret-mode compiles dominate test time
    r = rng.exponential(3.0, n)
    vec = rng.normal(size=(n, 3))
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    pos = vec * r[:, None]
    return pos, rng.uniform(0.5, 2, n), rng.uniform(0.02, 0.08, n)


@pytest.mark.slow
def test_theta0_equals_direct(clustered):
    """θ=0 → everything near-field → exact (f32) match with the direct sum,
    validating near-field math + target scatter."""
    pos, m, h = clustered
    tree = Octree(pos, m, leaf_capacity=32, multipole_order=0,
                  softenings=h, kernel="plummer")
    phi = tree_potentials_device(tree, theta=0.0)
    phi_dir = native_direct_potentials(pos, m, h, kernel="plummer")
    np.testing.assert_allclose(phi, phi_dir, rtol=2e-6)
    acc = tree_accelerations_device(tree, theta=0.0)
    acc_dir = native_direct_accelerations(pos, m, h, kernel="plummer")
    np.testing.assert_allclose(acc, acc_dir, rtol=1e-3,
                               atol=np.abs(acc_dir).max() * 1e-5)


def test_order_convergence(clustered):
    pos, m, _ = clustered
    phi_dir = native_direct_potentials(pos, m)
    acc_dir = native_direct_accelerations(pos, m)
    scale = np.median(np.linalg.norm(acc_dir, axis=1))
    prev_p, prev_a = np.inf, np.inf
    for order in (0, 3):
        tree = Octree(pos, m, leaf_capacity=32, multipole_order=order)
        p = tree_potentials_device(tree, theta=0.6)
        a = tree_accelerations_device(tree, theta=0.6)
        perr = np.abs((p - phi_dir) / phi_dir).max()
        aerr = (np.linalg.norm(a - acc_dir, axis=1) / scale).max()
        assert perr < prev_p
        assert aerr < prev_a * 1.2
        prev_p, prev_a = perr, aerr
    assert prev_p < 5e-4
    assert prev_a < 5e-2


def test_matches_native_tree_accuracy_class(clustered):
    """Device evaluation is at least as accurate as the per-particle native
    traversal at the same θ/order (the block criterion is conservative)."""
    pos, m, _ = clustered
    phi_dir = native_direct_potentials(pos, m)
    tree = Octree(pos, m, leaf_capacity=32, multipole_order=3)
    dev = tree_potentials_device(tree, theta=0.6)
    nat = tree.compute_potentials(theta=0.6)
    dev_err = np.abs((dev - phi_dir) / phi_dir).max()
    nat_err = np.abs((nat - phi_dir) / phi_dir).max()
    assert dev_err <= nat_err * 1.5


def test_block_list_stats(clustered):
    pos, m, _ = clustered
    tree = Octree(pos, m, leaf_capacity=32, multipole_order=0)
    prep = prepare_tree_device(tree, theta=0.6)
    st = prep["stats"]
    # per-leaf blocks are compact: near-field lists stay bounded
    assert st["max_leaf"] < len(pos)
    assert st["mean_leaf"] < len(pos) / 2
    assert prep["n_blocks"] > 10


def test_native_tile_packer_matches_numpy(clustered):
    """The C++ tile packer (pnx_tree_pack_leaf_tiles) is bit-identical to
    the numpy reference packer across caps (padded lanes, sentinel, dummy
    row, orig-index row included)."""
    from pynbodyext_tpu.gravity.tree_pallas import pack_leaf_tiles
    pos, m, h = clustered
    tree = Octree(pos, m, leaf_capacity=32, multipole_order=0,
                  softenings=h, kernel="plummer")
    p, pm, ph, orig = tree.particles_tree_order()
    lstarts, lcounts = tree.leaves()
    extent = float(np.max(p.max(0) - p.min(0)))
    sentinel = (p.mean(0) + 3.0 * extent).astype(np.float64)
    for cap in (32, 50):
        ref = pack_leaf_tiles(p, pm, ph, orig, lstarts, lcounts,
                              sentinel, cap)
        got = tree.pack_leaf_tiles(lstarts, lcounts, sentinel, cap)
        np.testing.assert_array_equal(got, ref, err_msg=f"cap={cap}")


def test_native_pad_lists_matches_numpy():
    """The C++ padded-list builder (pnx_pad_lists_i32) is bit-identical to
    the numpy lane/idx/where form for ragged contiguous-run lists."""
    from pynbodyext_tpu.gravity import _native
    if _native.lib is None:
        import pytest
        pytest.skip("native library unavailable")
    import ctypes
    rng = np.random.default_rng(3)
    counts = rng.integers(0, 37, 300).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    flat = rng.integers(0, 10_000, int(counts.sum())).astype(np.int32)
    if len(flat) == 0:
        flat = np.asarray([0], np.int32)
    fill = np.int32(-7)
    for w in (1, 16, 64):
        c = np.minimum(counts, w)
        lane = np.arange(w, dtype=np.int64)
        idx = starts[:, None] + lane[None, :]
        valid = lane[None, :] < c[:, None]
        np.minimum(idx, len(flat) - 1, out=idx)
        ref = np.where(valid, flat[idx], fill)
        got = np.empty((len(counts), w), np.int32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        _native.lib.pnx_pad_lists_i32(
            flat.ctypes.data_as(i32p), starts.ctypes.data_as(i64p),
            counts.ctypes.data_as(i64p), len(counts), w, fill,
            got.ctypes.data_as(i32p))
        np.testing.assert_array_equal(got, ref, err_msg=f"w={w}")


def test_gravity_api_device_flag(clustered):
    from pynbodyext_tpu.gravity import Gravity
    pos, m, h = clustered
    g = Gravity(pos.astype(np.float32), m.astype(np.float32),
                softening=h.astype(np.float32), force_reference=True)
    p_dev = g.tree_potentials(theta=0.5, device=True)
    p_cpu = np.asarray(g.tree_potentials(theta=0.5))
    np.testing.assert_allclose(p_dev, p_cpu, rtol=2e-2)


def test_gravity_api_device_routes_to_pallas(clustered, monkeypatch):
    """On TPU the self-set device path runs the production Pallas engines
    (entry points auto-flip to interpret mode here on CPU); prep is cached
    per (instance, theta)."""
    from pynbodyext_tpu.gravity import Gravity, api
    monkeypatch.setattr(api, "_tpu_available", lambda: True)
    pos, m, h = clustered
    pos, m, h = pos[:600], m[:600], h[:600]  # interpret mode is slow
    g = Gravity(pos.astype(np.float32), m.astype(np.float32),
                softening=h.astype(np.float32), force_reference=True)
    p_dev = g.tree_potentials(theta=0.5, device=True)
    a_dev = g.tree_accelerations(theta=0.5, device=True)
    assert 0.5 in g._pallas_preps  # prep cached and shared between legs
    p_cpu = np.asarray(g.tree_potentials(theta=0.5))
    a_cpu = np.asarray(g.tree_accelerations(theta=0.5))
    np.testing.assert_allclose(p_dev, p_cpu, rtol=2e-2)
    # accel components cross zero — BH-band rel errors spike there (the
    # device tree groups targets by leaf; the host tree traverses per
    # particle, so the far/near split differs legitimately)
    scale = np.abs(a_cpu).max()
    np.testing.assert_allclose(a_dev, a_cpu, rtol=1e-1, atol=scale * 5e-3)


def test_calculate_potential_tree_device(clustered):
    """Snapshot-level helper with method='tree-device'."""
    import pynbodyext_tpu as px
    from pynbodyext_tpu.gravity import calculate_potential
    pos, m, h = clustered
    snap = px.Snapshot(
        {"pos": px.QArray(pos.astype(np.float32), "kpc"),
         "mass": px.QArray(m.astype(np.float32), "Msol")},
        {"dm": slice(0, len(pos))}, {"a": 1.0, "h": 0.7})
    p_dev = calculate_potential(snap, softening=0.05, method="tree-device",
                                theta=0.5)
    p_dir = calculate_potential(snap, softening=0.05, method="direct")
    np.testing.assert_allclose(np.asarray(p_dev), np.asarray(p_dir),
                               rtol=2e-2)


def test_pallas_engine_theta0_equals_direct(clustered):
    """Pallas near-field kernel (interpret mode): θ=0 ≡ direct sum."""
    from pynbodyext_tpu.gravity.tree_tpu import (
        prepare_tree_pallas, tree_accelerations_device_pallas,
        tree_potentials_device_pallas)
    pos, m, h = clustered
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    prep = prepare_tree_pallas(tree, theta=0.0)
    phi = tree_potentials_device_pallas(tree, prep=prep, interpret=True)
    phi_dir = native_direct_potentials(pos, m, h, kernel="plummer")
    np.testing.assert_allclose(phi, phi_dir, rtol=3e-6)
    acc = tree_accelerations_device_pallas(tree, prep=prep, interpret=True)
    acc_dir = native_direct_accelerations(pos, m, h, kernel="plummer")
    np.testing.assert_allclose(acc, acc_dir, rtol=1e-3,
                               atol=np.abs(acc_dir).max() * 1e-5)


def test_pallas_engine_with_multipoles(clustered):
    from pynbodyext_tpu.gravity.tree_tpu import (
        prepare_tree_pallas, tree_potentials_device_pallas)
    pos, m, _ = clustered
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=3)
    prep = prepare_tree_pallas(tree, theta=0.6)
    phi = tree_potentials_device_pallas(tree, prep=prep, interpret=True)
    phi_dir = native_direct_potentials(pos, m)
    assert np.abs((phi - phi_dir) / phi_dir).max() < 1e-3


def test_device_soft_admissibility_includes_target_softening():
    """Block interaction lists must clear the block's max target softening
    too, not just node hmax (round-1 advisor finding)."""
    rng = np.random.default_rng(3)
    n = 3000
    pos = rng.normal(0, 1, (n, 3))
    m = rng.uniform(0.5, 2, n)
    h = np.full(n, 0.01)
    h[0] = 2.0
    pd = native_direct_potentials(pos, m, h, kernel="spline")
    tree = Octree(pos, m, leaf_capacity=32, multipole_order=3,
                  softenings=h, kernel="spline")
    pt = tree_potentials_device(tree, theta=0.8)
    assert abs((pt[0] - pd[0]) / pd[0]) < 1e-3


def test_far_monopole_eval_nonmultiple_width():
    """Node-list widths >2048 that are not a multiple of the 2048 tile must
    not drop trailing columns (round-1 advisor finding: width 2176 lost
    exactly 128/2176 of the far-field sum)."""
    import jax.numpy as jnp
    from pynbodyext_tpu.gravity.tree_pallas import far_monopole_eval
    rng = np.random.default_rng(11)
    c, tb, ln = 2, 128, 2176  # 2176 = 2048 + 128
    payload = np.zeros((c, 8, ln), np.float32)
    payload[:, 0:3] = rng.normal(10, 3, (c, 3, ln))
    payload[:, 3] = rng.uniform(0.5, 2, (c, ln))
    tgt = np.zeros((c, 8, tb), np.float32)
    tgt[:, 0:3] = rng.normal(0, 1, (c, 3, tb))
    out = np.asarray(far_monopole_eval(jnp.asarray(tgt),
                                       jnp.asarray(payload),
                                       interpret=True))
    # numpy reference over the FULL width
    for b in range(c):
        dx = payload[b, 0][None, :] - tgt[b, 0][:, None]
        dy = payload[b, 1][None, :] - tgt[b, 1][:, None]
        dz = payload[b, 2][None, :] - tgt[b, 2][:, None]
        r = np.sqrt(dx * dx + dy * dy + dz * dz)
        ref = -(payload[b, 3][None, :] / r).sum(axis=1)
        np.testing.assert_allclose(out[b, 0], ref, rtol=1e-4)


@pytest.mark.slow
def test_near_engines_agree():
    """All near-field engines (classes / dma / group / gdma / banded)
    produce the same near field (independent schedules of the same exact
    interaction set) — small N: interpret-mode grid steps cost ~0.5 s."""
    rng = np.random.default_rng(3)
    n = 600
    r = rng.exponential(3.0, n)
    vec = rng.normal(size=(n, 3))
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    pos = vec * r[:, None]
    m = rng.uniform(0.5, 2, n)
    h = rng.uniform(0.02, 0.08, n)
    tree = Octree(pos, m, leaf_capacity=64, multipole_order=0,
                  softenings=h, kernel="plummer")
    from pynbodyext_tpu.gravity import tree_tpu
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.5, group_leaves=8)
    kern = prep["kernel"]
    ref = _near_ref_numpy(prep, accel=False)
    scale = np.abs(ref).max()
    for eng, fn in (("classes", tree_tpu._near_chunked),
                    ("dma", tree_tpu._near_dma),
                    ("group", tree_tpu._near_group),
                    ("gdma", tree_tpu._near_gdma),
                    ("banded", tree_tpu._near_banded)):
        got = fn(prep, kern, True, False)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=scale * 2e-6,
                                   err_msg=eng)


def _near_ref_numpy(prep, accel):
    """Near field from the per-leaf lists in plain numpy (plummer)."""
    tiles = np.asarray(prep["tiles"], np.float64)
    nb, cap = prep["n_blocks"], prep["cap"]
    offs, cnts = prep["near_offsets"], prep["near_counts"]
    flat = prep["near_flat"]
    out = np.zeros((nb, cap, 3) if accel else (nb, cap))
    for b in range(nb):
        src = tiles[flat[offs[b]:offs[b] + cnts[b]]]  # (L, 8, cap)
        sx = src[:, 0].ravel()[None, :]
        sy = src[:, 1].ravel()[None, :]
        sz = src[:, 2].ravel()[None, :]
        sm = src[:, 3].ravel()[None, :]
        sh = src[:, 4].ravel()[None, :]
        so = src[:, 5].ravel()[None, :]
        t = tiles[b]
        dx = sx - t[0][:, None]
        dy = sy - t[1][:, None]
        dz = sz - t[2][:, None]
        r2 = dx * dx + dy * dy + dz * dz
        r2 = np.where(so == t[5][:, None], np.inf, r2)
        hh = np.maximum(sh, t[4][:, None])
        if accel:
            g = (r2 + hh * hh) ** -1.5 * sm
            out[b] = np.stack([(g * dx).sum(1), (g * dy).sum(1),
                               (g * dz).sum(1)], axis=1)
        else:
            out[b] = -(sm / np.sqrt(r2 + hh * hh)).sum(1)
    return out


@pytest.mark.slow
def test_banded_engine_vs_numpy_and_chunking(clustered):
    """Banded near engine vs a plain-numpy near-field reference, for both
    potentials and accelerations, across window sizes R and chunk
    boundaries (tiny w_budget/gcap force many chunks)."""
    pos, m, h = clustered
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    from pynbodyext_tpu.gravity.tree_tpu import (_near_banded,
                                                 prepare_tree_pallas)
    prep = prepare_tree_pallas(tree, theta=0.5, group_leaves=8)
    kern = prep["kernel"]
    for accel in (False, True):
        ref = _near_ref_numpy(prep, accel)
        scale = np.abs(ref).max()
        for R, Gn, wb, gc in ((8, 4, 8192, 1024), (4, 8, 4, 2),
                              (16, 2, 64, 3), (8, 1, 16, 2)):
            got = _near_banded(prep, kern, True, accel=accel, R=R, Gn=Gn,
                               w_budget=wb, gcap=gc)
            np.testing.assert_allclose(
                got, ref, rtol=2e-4, atol=scale * 2e-6,
                err_msg=f"accel={accel} R={R} Gn={Gn} wb={wb} gcap={gc}")


def test_far_payload_eval_kernel():
    """Pre-gathered pallas far kernel vs numpy (potentials + accel),
    incl. non-multiple-of-ts widths."""
    import jax.numpy as jnp
    from pynbodyext_tpu.gravity.tree_pallas import far_payload_eval
    rng = np.random.default_rng(7)
    c, tb, w = 3, 128, 2176  # 2176 % 2048 != 0 → exercises padding
    tgt = np.zeros((c, 8, tb), np.float32)
    tgt[:, 0:3] = rng.normal(0, 5, (c, 3, tb))
    pay = np.zeros((c, 4, w), np.float32)
    pay[:, 0:3] = rng.normal(0, 50, (c, 3, w)) + 100.0  # far away
    pay[:, 3] = rng.uniform(1, 2, (c, w))
    for accel in (False, True):
        out = np.asarray(far_payload_eval(jnp.asarray(tgt), jnp.asarray(pay),
                                          accel=accel, interpret=True))
        for b in range(c):
            dx = pay[b, 0][None, :] - tgt[b, 0][:, None]
            dy = pay[b, 1][None, :] - tgt[b, 1][:, None]
            dz = pay[b, 2][None, :] - tgt[b, 2][:, None]
            r2 = (dx * dx + dy * dy + dz * dz).astype(np.float64)
            if accel:
                g = pay[b, 3][None, :] * r2 ** -1.5
                np.testing.assert_allclose(out[b, 0], (g * dx).sum(1),
                                           rtol=2e-4)
                np.testing.assert_allclose(out[b, 2], (g * dz).sum(1),
                                           rtol=2e-4)
            else:
                ref = -(pay[b, 3][None, :] / np.sqrt(r2)).sum(1)
                np.testing.assert_allclose(out[b, 0], ref, rtol=1e-4)


def test_far_payload_batch_eval_kernel():
    """Row-batched pre-gathered far kernel vs numpy."""
    import jax.numpy as jnp
    from pynbodyext_tpu.gravity.tree_pallas import far_payload_batch_eval
    rng = np.random.default_rng(9)
    c, tb, w, B = 8, 128, 384, 4
    tgt = np.zeros((c, 8, tb), np.float32)
    tgt[:, 0:3] = rng.normal(0, 5, (c, 3, tb))
    pay = np.zeros((c, 4, w), np.float32)
    pay[:, 0:3] = rng.normal(0, 50, (c, 3, w)) + 100.0
    pay[:, 3] = rng.uniform(1, 2, (c, w))
    for accel in (False, True):
        out = np.asarray(far_payload_batch_eval(
            jnp.asarray(tgt), jnp.asarray(pay), accel=accel,
            interpret=True, B=B))
        for b in range(c):
            dx = pay[b, 0][None, :] - tgt[b, 0][:, None]
            dy = pay[b, 1][None, :] - tgt[b, 1][:, None]
            dz = pay[b, 2][None, :] - tgt[b, 2][:, None]
            r2 = (dx * dx + dy * dy + dz * dz).astype(np.float64)
            if accel:
                g = pay[b, 3][None, :] * r2 ** -1.5
                np.testing.assert_allclose(out[b, 0], (g * dx).sum(1),
                                           rtol=2e-4)
                np.testing.assert_allclose(out[b, 2], (g * dz).sum(1),
                                           rtol=2e-4)
            else:
                ref = -(pay[b, 3][None, :] / np.sqrt(r2)).sum(1)
                np.testing.assert_allclose(out[b, 0], ref, rtol=1e-4)


def test_packed_engine_vs_numpy(clustered):
    """Dense-packed banded near engine (multi-leaf tiles, K×K adjacency
    bits) vs the plain-numpy per-leaf near reference, potentials and
    accelerations, incl. chunk boundaries."""
    pos, m, h = clustered
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    from pynbodyext_tpu.gravity import tree_tpu
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.5, group_leaves=8)
    for accel in (False, True):
        ref_blocks = _near_ref_numpy(prep, accel)
        ref = tree_tpu._scatter_leaf_blocks(
            prep, np.asarray(ref_blocks, np.float32), 3 if accel else 1)
        scale = np.abs(ref).max()
        for R, K, wb, gc in ((4, 5, 16384, 4096), (8, 3, 12, 2)):
            got = tree_tpu._near_packed(prep, prep["kernel"], True,
                                        accel=accel, R=R, K=K,
                                        w_budget=wb, gcap=gc)
            np.testing.assert_allclose(
                got, ref, rtol=2e-4, atol=scale * 2e-6,
                err_msg=f"accel={accel} R={R} K={K}")


def test_packed_accel_forms_agree(clustered):
    """The switchable accel bundle forms (MXU bundle, transposed MXU
    contraction, bf16 bundle) are measurement variants of the SAME sum —
    they must agree with the default (plain diff, the measured-fastest
    form) to f32 noise.  (bf16 only differs on real TPU dots; interpret
    mode ignores precision hints.)"""
    pos, m, h = clustered
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    from pynbodyext_tpu.gravity import tree_tpu
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.5, group_leaves=8)
    base = tree_tpu._near_packed(prep, prep["kernel"], True, accel=True)
    scale = np.abs(base).max()
    for form in ("bundle", "bundle_t", "bundle_bf16"):
        got = tree_tpu._near_packed(prep, prep["kernel"], True, accel=True,
                                    accel_form=form)
        np.testing.assert_allclose(got, base, rtol=5e-4,
                                   atol=scale * 5e-5, err_msg=form)


@pytest.mark.slow
def test_far_mxu_t_matches_mxu(clustered):
    """Transposed far accel contraction ((3,ts)@(ts,tb) keeps the lane
    dim full) is numerically the same sum as far_engine='mxu'."""
    pos, m, h = clustered
    from pynbodyext_tpu.gravity import tree_tpu
    tree = Octree(pos + 250.0, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.6, group_leaves=8)
    tree_tpu._ensure_far_classes(prep)
    fm = np.asarray(tree_tpu._far_eval(prep, accel=True, interpret=True,
                                       row_slice=slice(0, 3),
                                       far_engine="mxu"))
    ft = np.asarray(tree_tpu._far_eval(prep, accel=True, interpret=True,
                                       row_slice=slice(0, 3),
                                       far_engine="mxu_t"))
    ok = np.isfinite(fm)  # padded lanes are NaN in BOTH engines
    assert ok.any()
    np.testing.assert_allclose(ft[ok], fm[ok], rtol=1e-4,
                               atol=np.abs(fm[ok]).max() * 1e-5)


@pytest.mark.slow
def test_pdma_engine_vs_numpy(clustered):
    """Packed-DMA near engine (per-tile window loop, nbuf-deep manual DMA
    pipeline, register accumulation) vs the numpy per-leaf reference —
    same window lists as 'packed', different schedule.  Small w_budget /
    gcap exercise chunk boundaries and the ng_eff gating."""
    pos, m, h = clustered
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    from pynbodyext_tpu.gravity import tree_tpu
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.5, group_leaves=8)
    for accel in (False, True):
        ref_blocks = _near_ref_numpy(prep, accel)
        ref = tree_tpu._scatter_leaf_blocks(
            prep, np.asarray(ref_blocks, np.float32), 3 if accel else 1)
        scale = np.abs(ref).max()
        for R, K, wb, gc, nbuf in ((4, 5, 16384, 4096, 8),
                                   (4, 5, 64, 16, 2)):
            got = tree_tpu._near_pdma(prep, prep["kernel"], True,
                                      accel=accel, R=R, K=K,
                                      w_budget=wb, gcap=gc, nbuf=nbuf)
            np.testing.assert_allclose(
                got, ref, rtol=2e-4, atol=scale * 2e-6,
                err_msg=f"accel={accel} R={R} K={K} wb={wb}")


@pytest.mark.slow
def test_diag_engine_vs_numpy(clustered):
    """Diagonal-band near engine (fully grid-indexed band over packed
    tiles + packed-window remainder) vs the numpy per-leaf reference.
    nb2=1 forces a large out-of-band remainder; nb2=16 puts everything
    in band — both splits must agree with the reference."""
    pos, m, h = clustered
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    from pynbodyext_tpu.gravity import tree_tpu
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.5, group_leaves=8)
    for accel in (False, True):
        ref_blocks = _near_ref_numpy(prep, accel)
        ref = tree_tpu._scatter_leaf_blocks(
            prep, np.asarray(ref_blocks, np.float32), 3 if accel else 1)
        scale = np.abs(ref).max()
        for nb2, SB in ((1, 8), (16, 8)):
            got = tree_tpu._near_diag(prep, prep["kernel"], True,
                                      accel=accel, SB=SB, nb2=nb2)
            d = prep[("diag", 5, SB, nb2, 4, 1)]  # trailing 1 = ndev
            if nb2 == 1:
                assert d["rem"] is not None  # remainder path exercised
            # accel atol: the transposed (4,S)@(S,cap) bundle contraction
            # (needed on TPU — the (cap,4) rows re-stacked tripped a
            # Mosaic concat bug) rounds ~1e-5·scale differently from the
            # f64 reference sum order
            np.testing.assert_allclose(
                got, ref, rtol=2e-4,
                atol=scale * (2e-5 if accel else 2e-6),
                err_msg=f"accel={accel} nb2={nb2}")


def test_packed_engine_theta0_e2e(clustered):
    """θ=0 through the full device-tree entry points with the packed
    near engine ≡ direct sum."""
    pos, m, h = clustered
    from pynbodyext_tpu.gravity.tree_tpu import (
        prepare_tree_pallas, tree_accelerations_device_pallas,
        tree_potentials_device_pallas)
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    prep = prepare_tree_pallas(tree, theta=0.0)
    phi = tree_potentials_device_pallas(tree, prep=prep, interpret=True,
                                        near_engine="packed")
    phi_dir = native_direct_potentials(pos, m, h, kernel="plummer")
    np.testing.assert_allclose(phi, phi_dir, rtol=3e-6)
    acc = tree_accelerations_device_pallas(tree, prep=prep, interpret=True,
                                           near_engine="packed")
    acc_dir = native_direct_accelerations(pos, m, h, kernel="plummer")
    np.testing.assert_allclose(acc, acc_dir, rtol=1e-3,
                               atol=np.abs(acc_dir).max() * 1e-5)


def test_engine_guards_and_host_release(clustered):
    """Round-3 robustness: Gn bitmask guard, far_engine honored, and
    release_host_buffers with lazy host-side rebuild."""
    pos, m, h = clustered
    from pynbodyext_tpu.gravity import tree_tpu
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.5, group_leaves=8)
    kern = prep["kernel"]
    with pytest.raises(ValueError, match="Gn must be <= 32"):
        tree_tpu._near_banded(prep, kern, True, accel=False, Gn=64)
    # far_engine='pallas' requires the pre-gathered payload (absent when
    # the monopole payload was not built, e.g. multipole order > 0); an
    # explicit pallas request IS honored in interpret mode when present
    no_payload = dict(prep, far_pallas=False)
    with pytest.raises(ValueError, match="far_engine='pallas'"):
        tree_tpu._far_eval(no_payload, accel=False, interpret=True,
                           far_engine="pallas")
    phi_ref = tree_tpu.tree_potentials_device_pallas(
        tree, prep=prep, interpret=True, far_engine="xla")
    # dropping the pinned host copies must not change any engine's result
    # (structures rebuild lazily from the retained tree handle)
    prep2 = tree_tpu.prepare_tree_pallas(tree, theta=0.5, group_leaves=8)
    tree_tpu.release_host_buffers(prep2)
    assert prep2["_particles"] is None and prep2["_tiles_np"] is None
    phi2 = tree_tpu.tree_potentials_device_pallas(
        tree, prep=prep2, interpret=True, far_engine="xla",
        near_engine="classes")
    np.testing.assert_allclose(phi2, phi_ref, rtol=2e-5,
                               atol=np.abs(phi_ref).max() * 1e-6)


def test_prep_disk_cache_roundtrip(clustered, tmp_path):
    """cached_prepare_tree_pallas: miss builds + saves; hit skips the
    octree build entirely and solves to identical results; refresh
    persists lazily-built engine structures."""
    pos, m, h = clustered
    from pynbodyext_tpu.gravity import tree_tpu
    from pynbodyext_tpu.gravity.prep_cache import (
        cached_prepare_tree_pallas, refresh_tree_prep_cache)
    kw = dict(leaf_capacity=128, multipole_order=0, kernel="plummer",
              theta=0.5, group_leaves=8, cache_dir=tmp_path)
    prep1, tree1 = cached_prepare_tree_pallas(pos, m, h, **kw)
    assert tree1 is not None  # miss
    phi1 = tree_tpu.tree_potentials_device_pallas(
        tree1, prep=prep1, interpret=True, near_engine="packed")
    assert refresh_tree_prep_cache(prep1)  # packed structures appeared
    prep2, tree2 = cached_prepare_tree_pallas(pos, m, h, **kw)
    assert tree2 is None  # hit: no octree built
    assert ("packed", 5) in prep2  # lazy structures restored
    phi2 = tree_tpu.tree_potentials_device_pallas(
        None, prep=prep2, interpret=True, near_engine="packed")
    np.testing.assert_array_equal(phi1, phi2)
    # different theta → different key → miss
    kw2 = dict(kw, theta=0.6)
    prep3, tree3 = cached_prepare_tree_pallas(pos, m, h, **kw2)
    assert tree3 is not None


def test_prep_cache_save_after_release(clustered, tmp_path):
    """A prep whose host buffers were released (the bench's order of
    operations) still pickles self-contained: save_tree_prep rebuilds the
    particle arrays from the tree handle, so a reload in a fresh process
    can repack the packed/diag device tiles (BENCH r4c regression: the
    reloaded prep raised 'cannot rebuild host tables')."""
    pos, m, h = clustered
    from pynbodyext_tpu.gravity import tree_tpu
    from pynbodyext_tpu.gravity.prep_cache import (load_tree_prep,
                                                   save_tree_prep)
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.5, group_leaves=8)
    phi1 = tree_tpu.tree_potentials_device_pallas(
        tree, prep=prep, interpret=True, near_engine="packed")
    tree_tpu.release_host_buffers(prep)
    pth = tmp_path / "prep.pkl"
    assert save_tree_prep(prep, pth)
    prep2 = load_tree_prep(pth)
    assert prep2 is not None and prep2["_tree"] is None
    phi2 = tree_tpu.tree_potentials_device_pallas(
        None, prep=prep2, interpret=True, near_engine="packed")
    np.testing.assert_array_equal(phi1, phi2)


def test_leaf_tiles_device_build_matches_native(clustered):
    """The device-gathered leaf tile table (gather from the compact
    (n+1, 6) particle matrix) is bit-identical to the native C++ packer
    (csrc/octree.cpp pnx_tree_pack_leaf_tiles) including the dummy and
    %32 pad rows."""
    pos, m, h = clustered
    from pynbodyext_tpu.gravity import tree_tpu
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.5, group_leaves=8)
    pad32 = (-(prep["n_blocks"] + 1)) % 32
    ref = tree.pack_leaf_tiles(prep["lstarts"], prep["lcounts"],
                               prep["_sentinel"], prep["cap"],
                               pad_rows=pad32)
    np.testing.assert_array_equal(np.asarray(prep["tiles"]), ref)


def test_ptiles_device_build_matches_host(clustered):
    """The device-gathered packed tile table (_ptiles_on_device: lane-map
    gather from the resident leaf tiles) is bit-identical to the host
    reference assembly from particle arrays (_assemble_packed_table)."""
    pos, m, h = clustered
    from pynbodyext_tpu.gravity import tree_tpu
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.5, group_leaves=8)
    pk = tree_tpu._pack_dense_tiles(prep, 5)
    host = tree_tpu._assemble_packed_table(prep, pk["pstarts"],
                                           pk["pcounts"], pk["sub_of"])
    np.testing.assert_array_equal(np.asarray(pk["ptiles"]), host)


def test_prep_cache_diag_mirror_roundtrip(clustered, tmp_path):
    """The diag-band engine's host band structures persist in the cache
    (("diag_np", …) mirror): a reloaded prep rebuilds the device band
    WITHOUT re-running the pair-scatter math and solves bit-identically
    (round-5: the first warm 10M solve spent ~50 s re-deriving windows
    from ~30M pairs on the single host core)."""
    pos, m, h = clustered
    from pynbodyext_tpu.gravity import tree_tpu
    from pynbodyext_tpu.gravity.prep_cache import (load_tree_prep,
                                                   save_tree_prep)
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.5, group_leaves=8)
    phi1 = tree_tpu.tree_potentials_device_pallas(
        tree, prep=prep, interpret=True, near_engine="diag")
    assert any(isinstance(k, tuple) and k and k[0] == "diag_np"
               for k in prep)
    pth = tmp_path / "prep.pkl"
    assert save_tree_prep(prep, pth)
    prep2 = load_tree_prep(pth)
    assert any(isinstance(k, tuple) and k and k[0] == "diag_np"
               for k in prep2)
    # the packed device table rebuilds lazily (device gather from the
    # resident leaf tiles — no host assembly, no sidecar)
    assert "ptiles" not in prep2[("packed", 5)]
    phi2 = tree_tpu.tree_potentials_device_pallas(
        None, prep=prep2, interpret=True, near_engine="diag")
    np.testing.assert_array_equal(phi1, phi2)


@pytest.mark.slow
def test_device_at_points_vs_native(clustered):
    """Device-evaluated tree at arbitrary query points: exact (f32) match
    with the native C++ at-points traversal at θ=0; BH-band agreement at
    θ=0.7 (reference capability: ``tree.rs:1284``)."""
    pos, m, h = clustered
    from pynbodyext_tpu.gravity.tree_tpu import (
        prepare_tree_pallas, tree_accelerations_at_points_device,
        tree_potentials_at_points_device)
    rng = np.random.default_rng(5)
    pts = rng.normal(0.0, 4.0, (500, 3))
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    # θ=0: every leaf is near-field for every tile → equals direct sums
    prep0 = prepare_tree_pallas(tree, theta=0.0, group_leaves=8)
    phi0 = tree_potentials_at_points_device(tree, pts, prep=prep0,
                                            interpret=True)
    phi_dir = native_direct_potentials(pos, m, h, targets=pts,
                                       kernel="plummer")
    np.testing.assert_allclose(phi0, phi_dir, rtol=3e-6)
    acc0 = tree_accelerations_at_points_device(tree, pts, prep=prep0,
                                               interpret=True)
    acc_dir = native_direct_accelerations(pos, m, h, targets=pts,
                                          kernel="plummer")
    np.testing.assert_allclose(acc0, acc_dir, rtol=1e-3,
                               atol=np.abs(acc_dir).max() * 1e-5)
    # θ=0.7: within the Barnes–Hut error band of the native traversal
    prep7 = prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
    phi7 = tree_potentials_at_points_device(tree, pts, prep=prep7,
                                            interpret=True)
    rel = np.abs((phi7 - phi_dir) / phi_dir)
    assert np.median(rel) < 2e-4
    assert rel.max() < 5e-3


@pytest.mark.slow
def test_gravity_api_device_at_points(clustered):
    from pynbodyext_tpu.gravity import Gravity
    pos, m, h = clustered
    rng = np.random.default_rng(9)
    pts = rng.normal(0.0, 4.0, (200, 3))
    g = Gravity(pos.astype(np.float32), m.astype(np.float32),
                softening=h.astype(np.float32), force_reference=True)
    p_dev = g.tree_potentials(targets=pts, theta=0.5, device=True)
    p_cpu = np.asarray(g.tree_potentials(targets=pts, theta=0.5))
    np.testing.assert_allclose(p_dev, p_cpu, rtol=2e-2)
    a_dev = g.tree_accelerations(targets=pts, theta=0.5, device=True)
    a_cpu = np.asarray(g.tree_accelerations(targets=pts, theta=0.5))
    np.testing.assert_allclose(a_dev, a_cpu, rtol=5e-2,
                               atol=np.abs(a_cpu).max() * 2e-2)


@pytest.mark.slow
def test_far_mxu_engine_matches_xla(clustered):
    """MXU far engine (tile-local recentring + acceleration bundles) vs
    the fused XLA pre path: far-field-only difference, f32-tight on
    clustered data (the global-coordinate cancellation that killed the
    matmul form for NEAR pairs does not apply to θ-admissible nodes)."""
    pos, m, h = clustered
    from pynbodyext_tpu.gravity.tree_tpu import (
        prepare_tree_pallas, tree_accelerations_device_pallas,
        tree_potentials_device_pallas)
    tree = Octree(pos + 250.0, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    prep = prepare_tree_pallas(tree, theta=0.6, group_leaves=8)
    phi_x = tree_potentials_device_pallas(tree, prep=prep, interpret=True,
                                          far_engine="xla",
                                          near_engine="packed")
    phi_m = tree_potentials_device_pallas(tree, prep=prep, interpret=True,
                                          far_engine="mxu",
                                          near_engine="packed")
    np.testing.assert_allclose(phi_m, phi_x, rtol=3e-5,
                               atol=np.abs(phi_x).max() * 3e-6)
    acc_x = tree_accelerations_device_pallas(tree, prep=prep,
                                             interpret=True,
                                             far_engine="xla",
                                             near_engine="packed")
    acc_m = tree_accelerations_device_pallas(tree, prep=prep,
                                             interpret=True,
                                             far_engine="mxu",
                                             near_engine="packed")
    scale = np.abs(acc_x).max()
    np.testing.assert_allclose(acc_m, acc_x, rtol=1e-3, atol=scale * 3e-5)


def test_multipole_eval_matches_tables_f64():
    """Component-form evaluator (multipole_eval) vs an independent
    brute-force evaluation of the derivative tables, in pure f64 numpy
    (the module is backend-agnostic: only * and + on the inputs).
    Validates the COM-moment compaction invariants the fast far paths
    rely on: M_000 == mass handled by the caller, dipoles skipped."""
    from pynbodyext_tpu.gravity._multipole_tables import TABLES
    from pynbodyext_tpu.gravity.multipole_eval import (acc_moments_xyz,
                                                       multi_indices,
                                                       phi_moments_xyz)
    rng = np.random.default_rng(0)
    for order in (2, 3, 5):
        nm = len(multi_indices(order))
        x, y, z = rng.normal(0, 5, (3, 7, 11))
        M = rng.normal(0, 1, (nm, 1, 11))
        M[1:4] = 0.0  # COM moments: dipoles identically zero
        ri = 1.0 / np.sqrt(x * x + y * y + z * z)

        def D(n):
            out = 0.0
            for (a, b, c, m, coef) in TABLES[n]:
                out = out + coef * x**a * y**b * z**c * ri**m
            return out

        phi = M[0] * D((0, 0, 0))
        ax = ay = az = 0.0
        for p, n in enumerate(multi_indices(order)):
            s = -1.0 if sum(n) % 2 else 1.0
            cm = M[p] * s
            phi = phi + (0.0 if 1 <= p <= 3 else cm * D(n)) \
                if p else phi
            ax = ax + cm * D((n[0] + 1, n[1], n[2]))
            ay = ay + cm * D((n[0], n[1] + 1, n[2]))
            az = az + cm * D((n[0], n[1], n[2] + 1))
        got_phi = M[0] * ri + phi_moments_xyz(x, y, z, ri,
                                              lambda p: M[p], order)
        ri3 = ri ** 3
        ms = acc_moments_xyz(x, y, z, ri, lambda p: M[p], order)
        got = np.stack([-M[0] * x * ri3 + ms[0],
                        -M[0] * y * ri3 + ms[1],
                        -M[0] * z * ri3 + ms[2]])
        ref = np.stack([ax, ay, az])
        assert np.abs(got_phi - phi).max() / np.abs(phi).max() < 1e-12
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


def test_multipole_eval_deep_core_f32_no_overflow():
    """Deep-tree far pairs (node size ~1e-4, ri ≈ 7e3) in f32: the naive
    ``ri^m`` table form materialized ri¹¹ ≈ 2e42 > f32max — 2551 NaN
    order-5 potentials at 10M clustered (round-5 measured).  The
    homogeneous unit-component form caps powers at ri^(order+2); results
    must be finite and match an f64 reference."""
    import jax.numpy as jnp

    from pynbodyext_tpu.gravity._multipole_tables import TABLES
    from pynbodyext_tpu.gravity.multipole_eval import (acc_moments_xyz,
                                                       multi_indices,
                                                       phi_moments_xyz)
    rng = np.random.default_rng(3)
    size = 1e-4  # deepest-leaf scale at 10M clustered
    for order in (3, 5):
        idx = multi_indices(order)
        x, y, z = rng.normal(0, 1.5 * size, (3, 4, 9))
        M = np.array([rng.normal(0, size ** sum(n), (4, 9))
                      for n in idx])
        M[1:4] = 0.0
        ri = 1.0 / np.sqrt(x * x + y * y + z * z)

        def D(n):
            out = 0.0
            for (a, b, c, m, coef) in TABLES[n]:
                out = out + coef * x**a * y**b * z**c * ri**m
            return out

        ref_phi = M[0] * ri
        for p, n in enumerate(idx):
            if sum(n) < 2:
                continue
            s = -1.0 if sum(n) % 2 else 1.0
            ref_phi = ref_phi + s * M[p] * D(n)
        xf, yf, zf, rif = (jnp.asarray(v, jnp.float32)
                           for v in (x, y, z, ri))
        Mf = jnp.asarray(M, jnp.float32)
        got_phi = Mf[0] * rif + phi_moments_xyz(xf, yf, zf, rif,
                                                lambda p: Mf[p], order)
        got_acc = acc_moments_xyz(xf, yf, zf, rif, lambda p: Mf[p], order)
        assert np.isfinite(np.asarray(got_phi)).all(), f"order {order}"
        for g in got_acc:
            assert np.isfinite(np.asarray(g)).all(), f"order {order}"
        rel = (np.abs(np.asarray(got_phi, np.float64) - ref_phi)
               / np.abs(ref_phi).max())
        assert rel.max() < 1e-5, f"order {order}: {rel.max()}"


def test_far_order3_payload_engines_agree():
    """Order-3 far field: the COMPACT pre-gathered payload (XLA pre and
    the batched Pallas kernel with the in-kernel moment contraction)
    agrees with the full-moment device-gather path to f32 noise on the
    same interaction lists (VERDICT r3 item 4)."""
    import jax.numpy as jnp  # noqa: F401

    from pynbodyext_tpu.gravity import tree_tpu
    from pynbodyext_tpu.gravity.tree_tpu import (
        prepare_tree_pallas, tree_accelerations_device_pallas,
        tree_potentials_device_pallas)
    rng = np.random.default_rng(6)
    n = 6000
    cen = rng.normal(0, 50, (8, 3))
    pos = cen[rng.integers(0, 8, n)] + rng.normal(0, 2.0, (n, 3))
    m = rng.uniform(0.5, 2.0, n)
    tree = Octree(pos, m, leaf_capacity=64, multipole_order=3)
    prep_pre = prepare_tree_pallas(tree, theta=0.7)
    assert prep_pre["far_pre"] and prep_pre["far_pallas"]
    old = tree_tpu._FAR_PREGATHER_BUDGET
    try:
        tree_tpu._FAR_PREGATHER_BUDGET = 0
        prep_g = prepare_tree_pallas(tree, theta=0.7)
    finally:
        tree_tpu._FAR_PREGATHER_BUDGET = old
    assert not prep_g["far_pre"]
    p_pre = tree_potentials_device_pallas(tree, prep=prep_pre,
                                          interpret=True)
    p_gat = tree_potentials_device_pallas(tree, prep=prep_g,
                                          interpret=True)
    a_pre = tree_accelerations_device_pallas(tree, prep=prep_pre,
                                             interpret=True)
    a_gat = tree_accelerations_device_pallas(tree, prep=prep_g,
                                             interpret=True)
    assert np.abs((p_pre - p_gat) / p_gat).max() < 5e-6
    scale = np.abs(a_gat).max(1).clip(1e-30)
    assert (np.abs(a_pre - a_gat).max(1) / scale).max() < 5e-6
    # explicit pallas far engine: in-kernel order-3 moment contraction
    p_pal = tree_potentials_device_pallas(tree, prep=prep_pre,
                                          interpret=True,
                                          far_engine="pallas")
    a_pal = tree_accelerations_device_pallas(tree, prep=prep_pre,
                                             interpret=True,
                                             far_engine="pallas")
    assert np.abs((p_pal - p_gat) / p_gat).max() < 5e-6
    assert (np.abs(a_pal - a_gat).max(1) / scale).max() < 5e-6


@pytest.mark.slow
def test_order5_pallas_matches_native(clustered):
    """Order-5 far field on the fast device engines is at least as
    accurate as the native per-particle traversal at the same θ/order —
    the multipole tables go to order 5+1 and the batched far kernels are
    order-generic (reference ASV order axis ∈ {2,3,4,5},
    ``benchmarks/bench_gravity.py:136-146``; VERDICT r4 item 9)."""
    from pynbodyext_tpu.gravity.tree_tpu import (
        prepare_tree_pallas, tree_accelerations_device_pallas,
        tree_potentials_device_pallas)
    pos, m, _ = clustered
    phi_dir = native_direct_potentials(pos, m)
    acc_dir = native_direct_accelerations(pos, m)
    tree = Octree(pos, m, leaf_capacity=32, multipole_order=5)
    prep = prepare_tree_pallas(tree, theta=0.6, group_leaves=8)
    dev = tree_potentials_device_pallas(tree, prep=prep, interpret=True)
    nat = tree.compute_potentials(theta=0.6)
    dev_err = np.abs((dev - phi_dir) / phi_dir).max()
    nat_err = np.abs((nat - phi_dir) / phi_dir).max()
    assert dev_err <= nat_err * 1.5 + 1e-6
    scale = np.median(np.linalg.norm(acc_dir, axis=1))
    acc = tree_accelerations_device_pallas(tree, prep=prep, interpret=True)
    nacc = tree.compute_accelerations(theta=0.6)
    aerr = (np.linalg.norm(acc - acc_dir, axis=1) / scale).max()
    naerr = (np.linalg.norm(nacc - acc_dir, axis=1) / scale).max()
    assert aerr <= naerr * 1.5 + 1e-5


def test_device_out_matches_host(clustered):
    """``out='device'`` returns the combined result as a device array in
    original particle order, identical to the host path minus the
    readback (round-5 API: TPU-resident consumers skip the wire)."""
    import jax.numpy as jnp

    from pynbodyext_tpu.gravity import tree_tpu
    pos, m, h = clustered
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0,
                  softenings=h, kernel="plummer")
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.6, group_leaves=8)
    phi_h = tree_tpu.tree_potentials_device_pallas(
        tree, prep=prep, interpret=True, near_engine="diag")
    phi_d = tree_tpu.tree_potentials_device_pallas(
        tree, prep=prep, interpret=True, near_engine="diag", out="device")
    assert isinstance(phi_d, jnp.ndarray) and phi_d.shape == (len(pos),)
    np.testing.assert_array_equal(np.asarray(phi_d), phi_h)
    acc_d = tree_tpu.tree_accelerations_device_pallas(
        tree, prep=prep, interpret=True, near_engine="diag", out="device")
    acc_h = tree_tpu.tree_accelerations_device_pallas(
        tree, prep=prep, interpret=True, near_engine="diag")
    assert acc_d.shape == (len(pos), 3)
    np.testing.assert_array_equal(np.asarray(acc_d), acc_h)
    with pytest.raises(ValueError, match="device output"):
        tree_tpu.tree_potentials_device_pallas(
            tree, prep=prep, interpret=True, near_engine="packed",
            out="device")


def test_prep_cache_diag_warm_cycle(clustered, tmp_path):
    """Full diag warm cycle: first solve builds the band (host mirror
    persisted by refresh); reload starts the BACKGROUND warm thread
    (classes + diag tables + combine idx) and the first warm solve
    matches exactly (round-5: load_tree_prep(background_warm=True))."""
    pos, m, h = clustered
    from pynbodyext_tpu.gravity import tree_tpu
    from pynbodyext_tpu.gravity.prep_cache import (
        cached_prepare_tree_pallas, refresh_tree_prep_cache)
    kw = dict(leaf_capacity=128, multipole_order=0, kernel="plummer",
              theta=0.5, group_leaves=8, cache_dir=tmp_path)
    prep1, tree1 = cached_prepare_tree_pallas(pos, m, h, **kw)
    phi1 = tree_tpu.tree_potentials_device_pallas(
        tree1, prep=prep1, interpret=True, near_engine="diag")
    assert refresh_tree_prep_cache(prep1)  # diag_np mirror persisted
    assert any(isinstance(k, tuple) and k and k[0] == "diag_np"
               for k in prep1)
    prep2, tree2 = cached_prepare_tree_pallas(pos, m, h, **kw)
    assert tree2 is None
    assert "_warm_future" in prep2  # background warm in flight
    phi2 = tree_tpu.tree_potentials_device_pallas(
        None, prep=prep2, interpret=True, near_engine="diag")
    np.testing.assert_array_equal(phi1, phi2)
    acc2 = tree_tpu.tree_accelerations_device_pallas(
        None, prep=prep2, interpret=True, near_engine="diag")
    assert np.isfinite(acc2).all()
