"""Metrics harness: spans, snapshot, Prometheus exposition, MemTracker
(fast tier; no device compiles)."""

import tests.conftest  # noqa: F401

from swirl import metrics


def test_span_accumulates():
    with metrics.run_with_metric_collection() as c:
        with metrics.span("unit_test_phase"):
            pass
        metrics.gauge("g", 2.5)
        metrics.counter("n", 3)
    snap = c.snapshot()
    assert "unit_test_phase_time_ms" in snap
    assert snap["g"] == 2.5 and snap["n"] == 3.0


def test_prometheus_exposition_format():
    text = metrics.prometheus_exposition({"a.b-c": 1.0, "x_time_ms": 2.0})
    assert "# TYPE swirl_a_b_c gauge" in text
    assert "swirl_a_b_c 1.0" in text
    assert "swirl_x_time_ms 2.0" in text
    assert text.endswith("\n")


def test_memtracker_degrades_without_stats():
    tracker = metrics.MemTracker()
    with metrics.run_with_metric_collection() as c:
        with tracker.phase("commit"):
            pass
    # CPU test backend has no memory_stats; phase must be a clean no-op
    snap = c.snapshot()
    assert all(not k.startswith("mem.commit.peak") or v >= 0 for k, v in snap.items())


def test_exporter_degrades_without_gateway(monkeypatch):
    monkeypatch.delenv("SWIRL_PROMETHEUS_PUSHGATEWAY", raising=False)
    with metrics.run_with_metric_exporter() as c:
        metrics.gauge("y", 1.0)
    assert c.snapshot()["y"] == 1.0
