"""Unit tests for the compile-shape ramp guard (round-4 verdict item 2:
encode the tunnel-protection parking rule in code)."""

import threading
import time

import pytest

from video_similarity_search_tpu.utils import ramp_guard as rg


@pytest.fixture(autouse=True)
def fresh_guard(tmp_path, monkeypatch):
    monkeypatch.setenv("VSS_RAMP_LEDGER", str(tmp_path / "ledger.json"))
    monkeypatch.delenv("VSS_RAMP_MAX_NEW", raising=False)
    rg.reset_process_budget()
    yield
    rg.reset_process_budget()


def test_first_new_shape_allowed_then_recorded():
    calls = []
    out = rg.guarded_compile("m/b64", lambda: calls.append(1) or 42)
    assert out == 42 and calls == [1]
    # same key again: known-good now, passes without spending budget
    rg.reset_process_budget()
    assert rg.guarded_compile("m/b64", lambda: 7) == 7
    # and a different new key still fits in the fresh budget
    assert rg.guarded_compile("m/b96", lambda: 8) == 8


def test_second_new_shape_same_invocation_blocked():
    rg.guarded_compile("m/b64", lambda: 1)
    with pytest.raises(rg.RampGuardError):
        rg.guarded_compile("m/b128", lambda: 2)
    # the blocked compile never ran, so b128 is still new next invocation
    rg.reset_process_budget()
    assert rg.guarded_compile("m/b128", lambda: 2) == 2


def test_budget_env_overridable(monkeypatch):
    monkeypatch.setenv("VSS_RAMP_MAX_NEW", "3")
    for i in range(3):
        rg.guarded_compile(f"m/b{i}", lambda: i)
    with pytest.raises(rg.RampGuardError):
        rg.guarded_compile("m/b99", lambda: 0)


def test_retry_of_same_new_key_not_double_counted():
    """A failed compile attempt may be retried in-process without the
    retry reading as a second new shape."""
    with pytest.raises(ValueError):
        rg.guarded_compile("m/b64", lambda: (_ for _ in ()).throw(
            ValueError("compile failed")))
    assert rg.guarded_compile("m/b64", lambda: 3) == 3


def test_failed_compile_not_recorded_as_known_good():
    with pytest.raises(ValueError):
        rg.guarded_compile("m/bad", lambda: (_ for _ in ()).throw(
            ValueError()))
    ledger = rg._load_ledger()
    assert not any("m/bad" in k for k in ledger)


def test_liveness_probe_bounds_wedged_device(monkeypatch):
    """A probe that blocks (wedged tunnel) raises DeviceDeadError within
    the timeout instead of issuing the compile."""
    ran = []

    def blocked_probe(timeout_s):
        # simulate ramp_guard.probe_liveness against a dead backend: the
        # daemon thread never completes
        t = threading.Thread(target=lambda: time.sleep(60), daemon=True)
        t.start()
        t.join(timeout_s)
        raise rg.DeviceDeadError("probe timed out")

    monkeypatch.setattr(rg, "probe_liveness", blocked_probe)
    t0 = time.monotonic()
    with pytest.raises(rg.DeviceDeadError):
        rg.guarded_compile("m/b64", lambda: ran.append(1),
                           probe_timeout_s=0.5)
    assert not ran
    assert time.monotonic() - t0 < 10.0


def test_real_probe_passes_on_cpu_backend():
    rg.probe_liveness(timeout_s=30.0)


def test_probe_timeout_env_overridable(monkeypatch):
    """VSS_PROBE_TIMEOUT_S widens the default probe bound (congested but
    alive tunnels: round-5 observed 39 s for init + one scalar while a
    server-side compile drained, vs the 90 s hardcoded default)."""
    seen = []

    def fake_watchdog(fn, timeout_s):
        seen.append(timeout_s)
        return "ok", 2.0

    import video_similarity_search_tpu.utils.watchdog as wd
    monkeypatch.setattr(wd, "run_with_watchdog", fake_watchdog)
    monkeypatch.setenv("VSS_PROBE_TIMEOUT_S", "240")
    rg.probe_liveness()
    assert seen == [240.0]
    # explicit argument still wins over the env default
    rg.probe_liveness(timeout_s=5.0)
    assert seen == [240.0, 5.0]
