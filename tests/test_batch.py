"""Multi-snapshot batch execution."""

import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.batch import (batched_kappa_pipeline, map_snapshots,
                                  stack_snapshots)
from pynbodyext_tpu.compiled import kappa_rot_pipeline_from_snapshot


@pytest.fixture(scope="module")
def snaps():
    return [px.make_test_galaxy(800, 600, 1200, seed=s, center=(0, 0, 0),
                                vsys=(0, 0, 0)) for s in (1, 2, 3)]


def test_batched_matches_singles(snaps):
    ks = np.asarray(batched_kappa_pipeline(snaps))
    singles = [float(kappa_rot_pipeline_from_snapshot(s)) for s in snaps]
    np.testing.assert_allclose(ks, singles, rtol=1e-4)


def test_stack_requires_equal_n(snaps):
    odd = px.make_test_galaxy(100, 100, 100, seed=9)
    with pytest.raises(ValueError):
        stack_snapshots(snaps + [odd])


def test_map_snapshots(snaps):
    totals = map_snapshots(lambda s: float(px.ParamSum("mass")(s).value),
                           snaps)
    assert len(totals) == 3
    assert all(t == pytest.approx(totals[0], rel=1e-6) for t in totals)


def test_multifile_loader(tmp_path, snaps):
    """Multi-file gadget snapshots concatenate per family."""
    paths = []
    for i, s in enumerate(snaps[:2]):
        p = str(tmp_path / f"snap.{i}.hdf5")
        px.save_gadget_hdf5(s, p)
        paths.append(p)
    combo = px.load_gadget_hdf5(paths)
    assert len(combo) == len(snaps[0]) + len(snaps[1])
    assert len(combo.s) == len(snaps[0].s) + len(snaps[1].s)
    # glob form
    combo2 = px.load_gadget_hdf5(str(tmp_path / "snap.*.hdf5"))
    assert len(combo2) == len(combo)
    m = float(np.asarray(combo["mass"], dtype=np.float64).sum())
    exp = sum(float(np.asarray(s["mass"], dtype=np.float64).sum())
              for s in snaps[:2])
    assert m == pytest.approx(exp, rel=1e-6)


def test_batched_radius_honored(snaps):
    """The measurement-sphere radius propagates into the vmapped program."""
    k30 = np.asarray(batched_kappa_pipeline(snaps, radius=30.0))
    k2 = np.asarray(batched_kappa_pipeline(snaps, radius=2.0))
    assert not np.allclose(k30, k2)
    singles = [float(kappa_rot_pipeline_from_snapshot(s, radius=2.0))
               for s in snaps]
    np.testing.assert_allclose(k2, singles, rtol=1e-4)


def test_batched_boxsize_from_properties():
    """boxsize=None reads each snapshot's own boxsize property (wrapped
    snapshots unwrap identically to the single path)."""
    wrapped = [px.make_test_galaxy(800, 600, 1200, seed=s, wrapped=True)
               for s in (4, 5)]
    ks = np.asarray(batched_kappa_pipeline(wrapped))
    singles = [float(kappa_rot_pipeline_from_snapshot(s)) for s in wrapped]
    np.testing.assert_allclose(ks, singles, rtol=1e-4)


def test_generic_batched_pipeline(snaps):
    """batched_pipeline vmaps an arbitrary per-snapshot function with
    configurable fields/families (incl. derived fields + softening-style
    extras)."""
    import jax.numpy as jnp
    from pynbodyext_tpu.batch import batched_pipeline

    def gas_ke(ke, mass, gas_mask, **_):
        w = jnp.where(gas_mask, mass, 0.0)
        return jnp.sum(w * ke)

    got = np.asarray(batched_pipeline(gas_ke, snaps,
                                      fields=("ke", "mass"),
                                      families=("gas",)))
    for i, s in enumerate(snaps):
        ke = np.asarray(s["ke"].value, np.float64)
        m = np.asarray(s["mass"].value, np.float64)
        g = np.asarray(s.family_mask("gas"))
        assert got[i] == pytest.approx(float((ke * m * g).sum()), rel=1e-4)
