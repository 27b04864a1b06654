"""bench.py degraded-mode fallback: accelerator unreachable -> CPU run.

Reference parity: GPU model-load failure falls back to CPU with re-optimized
(smaller/int8) params and a visible warning (一键实时识别麦克风.py:1138-1175).
bench.py mirrors that at the harness level so the driver's end-of-round run
produces a clearly-marked CPU number instead of hanging on a wedged backend
init (axon relay outages run multi-hour).
"""

from __future__ import annotations

import subprocess

import pytest

import bench


@pytest.fixture(autouse=True)
def _isolate_degraded(monkeypatch):
    monkeypatch.setattr(bench, "DEGRADED", {})
    yield


def test_wait_for_tpu_returns_false_when_budget_exhausted(monkeypatch):
    monkeypatch.setenv("BENCH_WAIT_TPU_S", "0.001")

    def failing_run(*a, **k):
        return subprocess.CompletedProcess(a, returncode=1)

    monkeypatch.setattr(subprocess, "run", failing_run)
    assert bench.wait_for_tpu() is False


def test_wait_for_tpu_disabled_budget_skips_probe(monkeypatch):
    monkeypatch.setenv("BENCH_WAIT_TPU_S", "0")

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("probe must not run with budget 0")

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench.wait_for_tpu() is True


def test_force_cpu_fallback_marks_and_downgrades(monkeypatch):
    monkeypatch.delenv("BENCH_MODEL", raising=False)
    bench.force_cpu_fallback()
    import os

    assert os.environ["BENCH_MODEL"] == "tiny"
    assert bench.DEGRADED["degraded_model"] == "tiny"
    assert "cpu-fallback" in bench.DEGRADED["degraded_backend"]


def test_force_cpu_fallback_respects_explicit_model(monkeypatch):
    monkeypatch.setenv("BENCH_MODEL", "base")
    bench.force_cpu_fallback()
    import os

    assert os.environ["BENCH_MODEL"] == "base"  # explicit choice wins
    assert "degraded_model" not in bench.DEGRADED
    assert "degraded_backend" in bench.DEGRADED
