"""Gravity calculator nodes in the DAG (GravPotential/GravAcceleration)."""

import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.properties import GravAcceleration, GravPotential


@pytest.fixture(scope="module")
def small_snap():
    return px.make_test_galaxy(400, 300, 500, seed=5,
                               center=(0.0, 0.0, 0.0), vsys=(0.0, 0.0, 0.0))


def test_potential_node(small_snap):
    phi = GravPotential(softening="0.1 kpc").filter(
        px.Sphere(20.0))(small_snap)
    n_in = int(np.asarray(px.Sphere(20.0).where(small_snap)).sum())
    assert phi.shape[0] == n_in
    assert float(np.asarray(phi).max()) < 0
    assert str(phi.units) == "km**2 s**-2"


def test_acceleration_node(small_snap):
    acc = GravAcceleration(softening="0.1 kpc")(small_snap)
    assert acc.shape == (len(small_snap), 3)
    # bound system: acceleration points inward on average
    pos = np.asarray(small_snap["pos"])
    radial = np.sum(np.asarray(acc) * pos, axis=1)
    assert (radial < 0).mean() > 0.9


def test_potential_node_tree_method(small_snap):
    phi_d = GravPotential(softening=0.1, method="direct")(small_snap)
    phi_t = GravPotential(softening=0.1, method="tree", theta=0.3)(small_snap)
    np.testing.assert_allclose(np.asarray(phi_t), np.asarray(phi_d),
                               rtol=5e-3)


def test_potential_cached_within_run(small_snap):
    """Two consumers of the same GravPotential share one solve."""
    phi = GravPotential(softening=0.1)
    pipe = px.calculate.Pipeline({"a": phi, "b": phi})
    res = pipe.run(small_snap)
    assert res.diagnostics["cache"]["hits"] >= 1
