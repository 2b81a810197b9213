"""Regression tests for the dryrun_multichip device probe.

Round-4 failure mode (MULTICHIP_r04 rc=124): the probe trusted
``"jax" in sys.modules`` as "platform fixed, probe cheap" — but this
sandbox's sitecustomize pre-imports jax in EVERY process, so the
in-process branch always ran, ``jax.devices()`` initialized the
configured axon backend, and with the relay dead it blocked forever.
The fix (``__graft_entry__._device_count_ok``) only trusts a backend
that is ALREADY initialized, and bounds even that probe with a
daemon-thread watchdog. These tests pin both properties.
"""

import os
import subprocess
import sys
import textwrap
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_uninitialized_backend_is_never_probed():
    """Sandbox simulation: jax imported, backend uninitialized,
    JAX_PLATFORMS pointing at a platform that must never be initialized
    by the gate. The probe must return False within seconds and leave
    the backend registry untouched (→ subprocess provisioning path)."""
    code = textwrap.dedent("""
        import sys, time
        import jax  # pre-import, exactly as the sandbox sitecustomize does
        from jax._src import xla_bridge
        assert not xla_bridge._backends, "precondition: no backend yet"
        sys.path.insert(0, %r)
        import __graft_entry__ as g
        t0 = time.monotonic()
        ok = g._device_count_ok(8)
        dt = time.monotonic() - t0
        assert ok is False, ok
        assert not xla_bridge._backends, list(xla_bridge._backends)
        assert dt < 5.0, dt
        print("PROBE_OK %%.3fs" %% dt)
    """) % (REPO,)
    env = dict(os.environ)
    # A platform name that would fail/block if the probe ever tried to
    # initialize it; the assertion on xla_bridge._backends proves the
    # probe never got that far.
    env["JAX_PLATFORMS"] = "wedged_remote_platform"
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PROBE_OK" in out.stdout, out.stdout + out.stderr


def test_probe_watchdog_bounds_blocked_devices(monkeypatch):
    """Even with a backend initialized, a jax.devices() that blocks (a
    wedged tunnel mid-session) must be bounded by the watchdog."""
    import jax

    import __graft_entry__ as g

    jax.devices()  # conftest guarantees an initialized 8-device CPU backend

    def blocked(*a, **k):
        time.sleep(60)

    monkeypatch.setattr(jax, "devices", blocked)
    t0 = time.monotonic()
    assert g._device_count_ok(8, probe_timeout_s=1.0) is False
    assert time.monotonic() - t0 < 10.0


def test_probe_trusts_initialized_backend():
    """Happy path: backend already initialized with enough devices →
    in-process execution is allowed; asking for more devices than exist
    falls back to provisioning."""
    import jax

    import __graft_entry__ as g

    n = jax.device_count()
    assert n >= 8
    assert g._device_count_ok(n) is True
    assert g._device_count_ok(n + 1) is False
