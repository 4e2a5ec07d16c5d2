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


def test_gate_empty_collection_is_vacuous_not_error(monkeypatch):
    # rc 5 = pytest collected nothing (e.g. tpu_tests/ renamed or emptied):
    # must surface as a vacuous gate, not environmental trouble (review r4)
    monkeypatch.setattr(subprocess, "run", _fake_run(5, "no tests ran in 0.01s"))
    status, detail = bench.run_tpu_gate()
    assert status == "skipped" and "no tests collected" in detail


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


def test_gate_retry_after_timeout_with_budget(monkeypatch):
    """A timed-out gate slice retries ONCE (bounded) when watchdog budget
    remains — a tunnel hang that recovers must not leave the artifact with
    a spurious gate ERROR (observed in the round-5 rehearsal)."""
    calls = []

    def fake_gate(timeout):
        calls.append(timeout)
        if len(calls) == 1:
            return "ERROR", "ERROR (TimeoutExpired: ... timed out after 1485 seconds)"
        return "pass", "pass (11 passed in 81.2s)"

    monkeypatch.setattr(bench, "run_tpu_gate", fake_gate)
    status, detail = bench.gate_with_recovery(1485, lambda: 2000)
    assert status == "pass" and "after a timed-out first attempt" in detail
    assert calls == [1485, 300]


def test_gate_no_retry_without_budget_or_on_real_error(monkeypatch):
    calls = []

    def fake_gate(timeout):
        calls.append(timeout)
        return "ERROR", "ERROR (TimeoutExpired: ...)"

    monkeypatch.setattr(bench, "run_tpu_gate", fake_gate)
    # budget too thin: no retry
    status, _ = bench.gate_with_recovery(1485, lambda: 600)
    assert status == "ERROR" and calls == [1485]
    # non-timeout errors never retry
    calls.clear()
    monkeypatch.setattr(
        bench, "run_tpu_gate", lambda t: (calls.append(t), ("ERROR", "ERROR (OSError: boom)"))[1]
    )
    status, _ = bench.gate_with_recovery(1485, lambda: 9999)
    assert status == "ERROR" and calls == [1485]


# --- _slope_rate: the two-point timing slope must never publish an absurd
# rate when RTT jitter inverts or flattens the pair (review r4), and must
# not reject legitimate slopes when the sync RTT dominates t_big in --quick
# mode (advisor r4). _slope_rate now probes run(0) twice first (the pure
# sync constant), so stubbed runners carry two leading sync samples. ---


def _runner(times):
    it = iter(times)
    return lambda n: next(it)


def test_slope_rate_cancels_constant_sync():
    # 30 ms sync + 7.5 ms/iter: the slope recovers the per-iter time exactly
    rate = bench._slope_rate(lambda n: 0.030 + n * 0.0075, 60)
    assert abs(1.0 / rate - 0.0075) < 1e-12


def test_slope_rate_retries_after_jitter_inversion():
    # leading pair = sync probes; first measurement pair inverted by a jitter
    # spike (t_small > t_big); the retry pair is clean and its slope is used:
    # (0.48 - 0.105) / (60 - 20) = 9.375 ms
    rate = bench._slope_rate(_runner([0.03, 0.03, 0.60, 0.48, 0.105, 0.48]), 60)
    assert abs(1.0 / rate - (0.48 - 0.105) / 40) < 1e-12


def test_slope_rate_falls_back_conservative_and_bounded():
    # both pairs flat (pure-noise slope ~0): fall back to the sync-corrected
    # direct rate, clamped so the correction can never manufacture more than
    # a 5x speedup over t_big/n_big — never 1e9 fps
    rate = bench._slope_rate(_runner([0.45, 0.45, 0.50, 0.50, 0.50, 0.50]), 60)
    assert abs(rate - 60 / max(0.50 - 0.45, 0.2 * 0.50)) < 1e-9
    assert rate <= 5 * 60 / 0.50 + 1e-9


def test_slope_rate_accepts_quick_mode_slope_under_big_rtt():
    # advisor r4: sync 100 ms, true slope 2 ms/iter, n_big=10 — the old
    # 0.2*t_big/n_big floor (2.4 ms) rejected this legitimate slope and
    # published the RTT-inflated fallback (83/s instead of 500/s)
    rate = bench._slope_rate(lambda n: 0.100 + n * 0.002, 10)
    assert abs(1.0 / rate - 0.002) < 1e-12


def test_slope_rate_single_iteration_budget():
    # n_big == 1 forces n_small == n_big: no slope exists, use the direct
    # rate with the measured sync constant removed
    rate = bench._slope_rate(_runner([0.1, 0.1, 0.2, 0.2]), 1)
    assert abs(rate - 1 / 0.1) < 1e-9
