"""Daemon-thread watchdog for calls that can block forever in C.

A wedged remote-TPU backend blocks inside the PJRT client with the GIL
released; no signal or exception can interrupt it. The only safe pattern
is to issue the call on a daemon thread, bound the wait, and ABANDON the
thread on timeout. Shared by bench.py's device probe, the ramp guard's
liveness probe, and the multichip dryrun's device-count probe (they were
three hand-rolled copies before round 5).
"""

from __future__ import annotations

import threading
from typing import Any, Tuple

__all__ = ["run_with_watchdog"]


def run_with_watchdog(fn, timeout_s: float) -> Tuple[str, Any]:
    """Run ``fn()`` on a daemon thread, waiting at most ``timeout_s``.

    Returns one of
      ``("ok", value)``      — fn returned ``value`` in time;
      ``("error", exc)``     — fn raised ``exc`` in time;
      ``("timeout", None)``  — fn did not finish; its thread is abandoned
                               (it cannot be interrupted while blocked in
                               C) and MAY still complete later — fn must
                               therefore be side-effect-safe.
    """
    out: dict = {}

    def target():
        try:
            out["value"] = fn()
        except BaseException as e:  # noqa: BLE001 — reported, not hidden
            out["error"] = e

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(timeout_s)
    if "value" in out:
        return "ok", out["value"]
    if "error" in out:
        return "error", out["error"]
    return "timeout", None
