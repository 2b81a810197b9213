"""Compile-shape ramp guard for perf harnesses and bench.

Round-4 incident: a single oversized server-side XLA compile (SlowFast at
B>=192, 128^2) killed the remote-TPU relay permanently and cost the rest
of the round's chip access. The prose "parking rule" from ROUND4.md is
encoded here as enforceable policy:

1. **Ramp**: at most ``VSS_RAMP_MAX_NEW`` (default 1) shape keys that
   have never successfully compiled on this device kind may be attempted
   per process invocation. Further new keys raise :class:`RampGuardError`
   — the caller re-invokes to take the next step, so shape growth is
   one-step-per-invocation and a wedge loses at most one invocation.
2. **Liveness**: before every guarded compile, device liveness is probed
   with a watchdog-bounded tiny dispatch; a wedged device raises
   :class:`DeviceDeadError` instead of issuing the next compile into a
   dead relay.
3. **Ledger**: successful compiles are recorded in a persistent JSON
   ledger keyed by device kind, so known-good shapes never count against
   the new-shape budget on later invocations.

The guard is a no-op burden on CPU test backends (probes are
microseconds, the ledger just fills up), so the same code path runs
everywhere. Reference to match: n/a — gate/perf infrastructure protecting
access to the hot loop the bench measures
(/root/reference/online_train.py:245-434).
"""

import json
import os
import threading
import time

__all__ = [
    "RampGuardError",
    "DeviceDeadError",
    "guarded_compile",
    "ledger_path",
    "reset_process_budget",
]


class RampGuardError(RuntimeError):
    """Raised when the per-invocation budget of never-before-compiled
    shapes is exhausted; re-invoke the harness to take the next step."""


class DeviceDeadError(RuntimeError):
    """Raised when the device liveness probe does not complete in time
    (wedged remote tunnel): do NOT issue further compiles."""


_NEW_KEYS_THIS_PROCESS: set = set()
_LOCK = threading.Lock()


def ledger_path() -> str:
    p = os.environ.get("VSS_RAMP_LEDGER")
    if p:
        return p
    root = os.environ.get("XDG_CACHE_HOME",
                          os.path.expanduser("~/.cache"))
    return os.path.join(root, "vss_ramp_ledger.json")


def _load_ledger() -> dict:
    try:
        with open(ledger_path()) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def _save_ledger(ledger: dict) -> None:
    path = ledger_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _record(full_key: str, entry: dict) -> None:
    """Merge one entry into the on-disk ledger, RE-LOADING it first: a
    guarded compile can take many minutes, and writing back the dict
    loaded before ``fn()`` would clobber keys recorded concurrently by
    other harness processes (they would then re-count as 'new' and burn
    later invocations' ramp budgets). The re-load shrinks the lost-update
    window from the whole compile to microseconds."""
    ledger = _load_ledger()
    ledger[full_key] = entry
    _save_ledger(ledger)


def _device_kind() -> str:
    import jax
    return jax.devices()[0].device_kind.replace(" ", "_")


def probe_liveness(timeout_s: float = None) -> None:
    """Dispatch a trivial computation and require the RESULT to
    materialize within ``timeout_s``. On the axon platform
    ``block_until_ready`` can return early (memory:
    axon-tunnel-measurement-traps), so the probe materializes a scalar
    with ``float()``, watchdog-bounded (utils/watchdog.py) so a wedged
    backend raises :class:`DeviceDeadError` instead of blocking.

    ``timeout_s`` defaults to ``VSS_PROBE_TIMEOUT_S`` (else 90 s): on a
    congested-but-alive tunnel (observed round 5: 39 s for backend init +
    one scalar while a server-side compile drained) the 90 s default can
    false-positive; widening via env beats editing every harness."""
    import jax.numpy as jnp

    from .watchdog import run_with_watchdog

    if timeout_s is None:
        timeout_s = float(os.environ.get("VSS_PROBE_TIMEOUT_S", "90"))

    status, payload = run_with_watchdog(
        lambda: float(jnp.asarray(1.0) + 1.0), timeout_s)
    if status == "error":
        raise DeviceDeadError(f"liveness probe errored: {payload!r}")
    if status == "timeout":
        raise DeviceDeadError(
            f"liveness probe did not materialize within {timeout_s:.0f}s "
            "— device/tunnel wedged; refusing to issue further compiles")


def seed_known_good(keys) -> None:
    """Record shape keys as known-good WITHOUT compiling them — for
    shapes proven by prior driver-captured runs (e.g. the standard bench
    shapes measured in BENCH_r03.json), so the per-invocation new-shape
    budget applies only to genuinely new experiments. Requires an
    initialized backend (call after a successful device probe)."""
    kind = _device_kind()
    ledger = _load_ledger()
    changed = False
    for key in keys:
        full_key = f"{kind}/{key}"
        if not ledger.get(full_key):
            ledger[full_key] = {"ok": True, "t": int(time.time()),
                                "seeded": True}
            changed = True
    if changed:
        _save_ledger(ledger)


def reset_process_budget() -> None:
    """Testing hook: forget which new keys this process has attempted."""
    with _LOCK:
        _NEW_KEYS_THIS_PROCESS.clear()


def guarded_compile(key: str, fn, *, probe_timeout_s: float = None,
                    probe: bool = True):
    """Run ``fn()`` (a call that may trigger a fresh XLA compile) under
    the ramp policy.

    ``key`` names the program shape (e.g. ``"slowfast/train/b192/s128"``);
    it is namespaced by device kind in the ledger. Returns ``fn()``'s
    result. Raises :class:`RampGuardError` when the key is new and the
    per-invocation new-shape budget (``VSS_RAMP_MAX_NEW``, default 1) is
    already spent, and :class:`DeviceDeadError` when the device fails the
    liveness probe.
    """
    # Probe FIRST: it is watchdog-bounded and initializes the backend if
    # needed, so the _device_kind() lookup below can never be the call
    # that blocks on a wedged tunnel.
    if probe:
        probe_liveness(probe_timeout_s)
    full_key = f"{_device_kind()}/{key}"
    ledger = _load_ledger()
    is_new = not ledger.get(full_key)
    if is_new:
        max_new = int(os.environ.get("VSS_RAMP_MAX_NEW", "1"))
        with _LOCK:
            if (full_key not in _NEW_KEYS_THIS_PROCESS
                    and len(_NEW_KEYS_THIS_PROCESS) >= max_new):
                raise RampGuardError(
                    f"ramp guard: {key!r} is a never-compiled shape and "
                    f"this invocation already attempted {max_new} new "
                    f"shape(s) ({sorted(_NEW_KEYS_THIS_PROCESS)}). "
                    "Re-invoke to take the next ramp step, or raise "
                    "VSS_RAMP_MAX_NEW.")
            _NEW_KEYS_THIS_PROCESS.add(full_key)
    result = fn()
    _record(full_key, {"ok": True, "t": int(time.time())})
    return result
