"""The bench's on-TPU gate must GATE (review r4): a pytest failure in
tpu_tests/ zeroes the headline metric, an all-skipped run is labeled
'skipped' (never a vacuous pass), and environmental trouble is 'ERROR'
without sinking the bench. These tests pin run_tpu_gate's status parsing
with a stubbed subprocess so the contract can't silently regress."""

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _fake_run(returncode, stdout):
    def fake(cmd, capture_output, text, timeout):
        return subprocess.CompletedProcess(cmd, returncode, stdout=stdout, stderr="")

    return fake


def test_gate_pass(monkeypatch):
    monkeypatch.setattr(subprocess, "run", _fake_run(0, "=== 10 passed in 42.0s ==="))
    status, detail = bench.run_tpu_gate()
    assert status == "pass" and "10 passed" in detail


def test_gate_all_skipped_is_not_a_pass(monkeypatch):
    monkeypatch.setattr(subprocess, "run", _fake_run(0, "=== 10 skipped in 1.2s ==="))
    status, detail = bench.run_tpu_gate()
    assert status == "skipped" and detail.startswith("skipped")


def test_gate_failure(monkeypatch):
    monkeypatch.setattr(
        subprocess, "run", _fake_run(1, "=== 1 failed, 9 passed in 40.0s ===")
    )
    status, detail = bench.run_tpu_gate()
    assert status == "FAIL" and "1 failed" in detail


def test_gate_internal_error(monkeypatch):
    monkeypatch.setattr(subprocess, "run", _fake_run(3, "INTERNALERROR> boom"))
    status, _ = bench.run_tpu_gate()
    assert status == "ERROR"


def test_gate_timeout(monkeypatch):
    def boom(cmd, capture_output, text, timeout):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", boom)
    status, detail = bench.run_tpu_gate(timeout=1)
    assert status == "ERROR" and "TimeoutExpired" in detail
