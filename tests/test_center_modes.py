"""CenPos 'pot' and 'hyb' modes (need a φ field) + ShiftPosTo integration."""

import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.properties import GravPotential


@pytest.fixture(scope="module")
def snap_with_phi():
    snap = px.make_test_galaxy(600, 400, 1000, seed=13,
                               center=(5.0, -3.0, 2.0), vsys=(0, 0, 0))
    phi = GravPotential(softening=0.1)(snap)
    return snap.with_fields(phi=phi)


def test_cenpos_pot(snap_with_phi):
    cen = np.asarray(px.CenPos("pot")(snap_with_phi).value)
    # potential minimum sits near the density center
    np.testing.assert_allclose(cen, [5.0, -3.0, 2.0], atol=2.0)
    # and is exactly the argmin particle position
    phi = np.asarray(snap_with_phi["phi"])
    pos = np.asarray(snap_with_phi["pos"])
    np.testing.assert_allclose(cen, pos[np.argmin(phi)], rtol=1e-6)


def test_cenpos_hyb(snap_with_phi):
    cen = np.asarray(px.CenPos("hyb")(snap_with_phi).value)
    np.testing.assert_allclose(cen, [5.0, -3.0, 2.0], atol=1.0)


def test_cenpos_pot_masked(snap_with_phi):
    """Masked view: argmin restricted to the selection."""
    sel = px.FamilyFilter("dm")
    cen = np.asarray(px.CenPos("pot").filter(sel)(snap_with_phi).value)
    phi = np.asarray(snap_with_phi["phi"])
    pos = np.asarray(snap_with_phi["pos"])
    mask = np.asarray(sel.where(snap_with_phi))
    idx = np.flatnonzero(mask)[np.argmin(phi[mask])]
    np.testing.assert_allclose(cen, pos[idx], rtol=1e-6)


def test_shift_pos_to_pot(snap_with_phi):
    out = px.ShiftPosTo("pot").apply_to(snap_with_phi)
    phi = np.asarray(snap_with_phi["phi"])
    # the potential-minimum particle is now at the origin
    np.testing.assert_allclose(np.asarray(out["pos"])[np.argmin(phi)],
                               0.0, atol=1e-5)
