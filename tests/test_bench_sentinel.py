"""The bench's self-defense against machine state (round 12, r11
verdict item 3): pure-function tests — no Spark session, no sleeping
(retries are env-pinned to zero where the loaded path is exercised)."""

import os
import sys
from unittest import mock

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench


def test_loaded_threshold_is_idle_ref_plus_tolerance():
    limit = bench.IDLE_SENTINEL_SEC * (1 + bench.SENTINEL_TOLERANCE)
    assert not bench._sentinel_loaded({"cpu_loop_sec": limit})
    assert bench._sentinel_loaded({"cpu_loop_sec": limit + 0.001})
    # the r11 contended start (0.517 s) flags; the idle re-run (0.48 s)
    # does not — the constant is calibrated against the recorded history
    assert bench._sentinel_loaded({"cpu_loop_sec": 0.517})
    assert not bench._sentinel_loaded({"cpu_loop_sec": 0.48})


def test_drift_is_symmetric_relative_delta():
    import pytest

    assert bench.sentinel_drift(
        {"cpu_loop_sec": 0.5}, {"cpu_loop_sec": 0.45}
    ) == pytest.approx(0.1)
    assert bench.sentinel_drift(
        {"cpu_loop_sec": 0.5}, {"cpu_loop_sec": 0.55}
    ) == pytest.approx(0.1)
    assert bench.sentinel_drift(
        {"cpu_loop_sec": 0.0}, {"cpu_loop_sec": 0.5}
    ) == 0.0


def test_await_idle_machine_accepts_idle_first_sample():
    with mock.patch.object(
        bench, "cpu_calibration",
        side_effect=[{"cpu_loop_sec": 0.44, "load_avg_1m": 0.5}],
    ):
        sample, rejected, loaded = bench.await_idle_machine()
    assert sample["cpu_loop_sec"] == 0.44
    assert rejected == [] and not loaded


def test_await_idle_machine_retries_then_flags(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SENTINEL_RETRIES", "2")
    monkeypatch.setenv("SPARK_GRAFT_SENTINEL_WAIT_SEC", "0")
    samples = [
        {"cpu_loop_sec": 0.70, "load_avg_1m": 4.7},
        {"cpu_loop_sec": 0.65, "load_avg_1m": 3.1},
        {"cpu_loop_sec": 0.60, "load_avg_1m": 2.5},
    ]
    with mock.patch.object(
        bench, "cpu_calibration", side_effect=list(samples)
    ):
        sample, rejected, loaded = bench.await_idle_machine()
    # all retries consumed, still loaded → run proceeds but is tainted
    assert sample == samples[-1]
    assert rejected == samples[:-1]
    assert loaded


def test_await_idle_machine_recovers_mid_retry(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SENTINEL_RETRIES", "3")
    monkeypatch.setenv("SPARK_GRAFT_SENTINEL_WAIT_SEC", "0")
    samples = [
        {"cpu_loop_sec": 0.70, "load_avg_1m": 4.7},
        {"cpu_loop_sec": 0.45, "load_avg_1m": 1.0},
    ]
    with mock.patch.object(
        bench, "cpu_calibration", side_effect=list(samples)
    ):
        sample, rejected, loaded = bench.await_idle_machine()
    assert sample == samples[-1]
    assert rejected == samples[:-1]
    assert not loaded
