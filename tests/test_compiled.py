"""Fused compiled pipeline ≡ calculator-engine pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.compiled import (kappa_rot_pipeline,
                                     kappa_rot_pipeline_from_snapshot)


def _engine_kappa(snap, radius=30.0):
    sel = px.Sphere(radius) & px.FamilyFilter("star")
    chain = (px.WrapBox(convention="minirange")
             .then(px.ShiftPosTo("ssc"))
             .then(px.ShiftVelTo("com").measure_with(sel))
             .then(px.AlignVec(px.AngMomVec()).measure_with(sel)))
    return float(px.KappaRot().transform(chain).filter(sel)(snap))


def test_fused_matches_engine(snap):
    """f32 fused vs engine: both are within ~1e-6 of the f64 golden anchor
    (tests/test_golden.py pins the f64 paths to 1e-12 of each other)."""
    fused = float(kappa_rot_pipeline_from_snapshot(snap))
    engine = _engine_kappa(snap)
    assert fused == pytest.approx(engine, rel=2e-5)


def test_fused_no_box():
    s = px.make_test_galaxy(2000, 1000, 3000, seed=11,
                            center=(0.0, 0.0, 0.0), vsys=(10.0, 0.0, 0.0))
    k = float(kappa_rot_pipeline(s["pos"].value, s["vel"].value,
                                 s["mass"].value, s.family_mask("star"),
                                 jnp.float32(0.0)))
    assert 0.9 < k < 1.0


def test_entry_points():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    import jax
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
