"""Utilities (perf, tracecache, log, types) and plot/image tests."""

import logging

import numpy as np
import pytest

import pynbodyext_tpu as px
from pynbodyext_tpu.plot import particle_image
from pynbodyext_tpu.util import PerfStats, profile_block, module_available
from pynbodyext_tpu.util.tracecache import EvalCacheManager, TraceManager


def test_profile_block():
    with profile_block() as info:
        sum(range(10000))
    assert info.time is not None and info.time >= 0
    assert info.memory_peak is not None
    assert "time=" in repr(info)


def test_perf_stats_steps():
    with PerfStats() as perf:
        with perf.step("a"):
            sum(range(1000))
        with perf.step("b"):
            sum(range(2000))
    assert len(perf.steps) == 2
    report = perf.report(title="t")
    assert "a" in report and "b" in report and "total" in report
    assert perf.total_time is not None


def test_eval_cache_manager():
    calls = {"n": 0}

    def expensive():
        calls["n"] += 1
        return 42

    # without a scope: no caching
    assert EvalCacheManager.get_or_compute("k", expensive) == 42
    assert EvalCacheManager.get_or_compute("k", expensive) == 42
    assert calls["n"] == 2
    with EvalCacheManager.scope():
        assert EvalCacheManager.active()
        assert EvalCacheManager.get_or_compute("k", expensive) == 42
        assert EvalCacheManager.get_or_compute("k", expensive) == 42
        assert calls["n"] == 3
        EvalCacheManager.invalidate("k")
        EvalCacheManager.get_or_compute("k", expensive)
        assert calls["n"] == 4
    assert not EvalCacheManager.active()


def test_trace_manager():
    tm = TraceManager("t")
    with tm.phase("outer"):
        with tm.phase("inner"):
            pass
    tm.cache_event("hit", "k")
    rep = tm.report()
    assert "outer" in rep and "inner" in rep and "cache-hit" in rep


def test_module_available():
    assert module_available("numpy")
    assert not module_available("definitely_not_a_module_xyz")


def test_logger_dedup(caplog):
    from pynbodyext_tpu.log import logger, set_dedup
    set_dedup(True)
    with caplog.at_level(logging.WARNING, logger="pnxtpu"):
        logger.warning("dup-message-xyz")
        logger.warning("dup-message-xyz")
    # the dedup filter is attached to the handler, not the logger, so use
    # the handler-level filter directly:
    from pynbodyext_tpu.log import _dedup
    rec = logging.LogRecord("pnxtpu", logging.WARNING, "", 0,
                            "unique-abc", (), None)
    assert _dedup.filter(rec)
    assert not _dedup.filter(rec)


def test_particle_image_conserves_mass(centered_snap):
    img, extent = particle_image(centered_snap, width=1000.0, resolution=64)
    pix_area = (1000.0 / 64) ** 2
    total = float(np.asarray(img).sum()) * pix_area
    exp = float(np.asarray(centered_snap["mass"], dtype=np.float64).sum())
    assert total == pytest.approx(exp, rel=1e-3)


def test_particle_image_masked(centered_snap):
    img_s, _ = particle_image(centered_snap.s, width=40.0, resolution=32)
    img_all, _ = particle_image(centered_snap, width=40.0, resolution=32)
    assert float(np.asarray(img_s).sum()) < float(np.asarray(img_all).sum())


def test_particle_image_average_qty(centered_snap):
    img, _ = particle_image(centered_snap.g, qty="temp", average=True,
                            width=30.0, resolution=16)
    vals = np.asarray(img)
    nz = vals[vals > 0]
    # gas temp is uniformly 1e4 K → averages must equal it exactly
    np.testing.assert_allclose(nz, 1e4, rtol=1e-4)


def test_get_signature_safe(centered_snap):
    from pynbodyext_tpu.util import get_signature_safe
    sig = get_signature_safe(px.ParamSum("mass"))
    assert sig[0] == "node"
    assert get_signature_safe(42) == ("value", 42)
    assert get_signature_safe(object())[0] == "value"
