"""The bench calibration guard's decision logic, tested without timing
sensitivity: thresholds come from env overrides so a pass and a fail are
both forced deterministically, and a broken calibration query must degrade
to diagnostics — never an exception (the artifact-zeroing failure mode the
r3 warmup bug taught)."""

from __future__ import annotations

import sys


def _bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_guard_passes_with_generous_tolerance(spark, sf_dir, monkeypatch):
    bench = _bench()
    monkeypatch.setenv("SPARK_GRAFT_BENCH_GUARD_PCT", "100000")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_GUARD_ATTEMPTS", "1")
    info = bench._window_guard(spark, sf_dir)
    assert info["degraded"] is False
    assert info["cal_query"] == bench._CAL_QUERY
    assert info["cal_min_sec"] > 0
    assert len(info["cal_attempts"]) == 1
    assert info["cal_ratio"] > 0
    assert len(info["loadavg_start"]) == 3
    assert info["mem_available_gb"] > 0


def test_guard_degrades_with_impossible_tolerance(spark, sf_dir, monkeypatch):
    # tolerance -100% => threshold 0 s => any real measurement is "degraded";
    # attempts=2 also pins the retry loop (two recorded attempts, no raise)
    bench = _bench()
    monkeypatch.setenv("SPARK_GRAFT_BENCH_GUARD_PCT", "-100")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_GUARD_ATTEMPTS", "2")
    monkeypatch.setattr("time.sleep", lambda s: None)
    info = bench._window_guard(spark, sf_dir)
    assert info["degraded"] is True
    assert len(info["cal_attempts"]) == 2
    assert info["cal_min_sec"] == min(info["cal_attempts"])


def test_guard_never_raises_on_broken_calibration(spark, sf_dir, monkeypatch):
    # unknown calibration query => guard_error diagnostics, degraded stays
    # False so the sweep still runs and the artifact is not zeroed
    bench = _bench()
    monkeypatch.setattr(bench, "_CAL_QUERY", "q_does_not_exist")
    info = bench._window_guard(spark, sf_dir)
    assert info["degraded"] is False
    assert "guard_error" in info
