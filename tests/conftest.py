"""Test configuration: force a CPU backend with 8 virtual devices.

Mirrors the reference's test discipline (SURVEY.md §4): mesh/sharding tests
run on virtual CPU devices — no TPU pod needed — and every kernel is
cross-validated against a pure-numpy reference on seeded data.
"""

import os

# must run before the first backend initialization
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import pynbodyext_tpu as px  # noqa: E402


@pytest.fixture(scope="session")
def snap():
    """Deterministic galaxy snapshot (displaced + boosted + box-wrapped),
    the analogue of the reference's gadget test snapshot
    (`tests/conftest.py:30-41`)."""
    return px.make_test_galaxy(n_star=5_000, n_gas=8_000, n_dm=12_000,
                               seed=42, wrapped=True)


@pytest.fixture(scope="session")
def centered_snap():
    """Small galaxy already centered at the origin, at rest, unwrapped."""
    return px.make_test_galaxy(n_star=3_000, n_gas=2_000, n_dm=4_000,
                               seed=7, center=(0.0, 0.0, 0.0),
                               vsys=(0.0, 0.0, 0.0))


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
