"""Live scalar-metrics sink: CSV per step, tensorboard events when a
writer is importable.

Reference counterpart: ``PlotterThread`` (coclr_utils/
tensorboard_utils.py:7-31), a background thread draining an unsynchronized
list into tensorboardX (used at coclr_classify.py:357-360). Here the sink
writes synchronously — a CSV append is microseconds against a >100 ms
train step, and the reference's writer thread is a documented race
(SURVEY.md §5 'Race detection'). The CSV is the always-available channel;
tensorboardX / torch.utils.tensorboard events are written too when either
package is importable.
"""

from __future__ import annotations

import os
from typing import Optional


class MetricsSink:
    """Append ``(step, tag, value)`` scalars to ``<logdir>/scalars.csv``
    (+ tensorboard events when available). Disabled instances are no-ops so
    call sites never branch."""

    def __init__(self, logdir: Optional[str], enabled: bool = True):
        self.enabled = bool(enabled and logdir)
        self._tb = None
        self._csv = None
        if not self.enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        path = os.path.join(logdir, "scalars.csv")
        new = not os.path.exists(path)
        self._csv = open(path, "a", buffering=1)  # line-buffered
        if new:
            self._csv.write("step,tag,value\n")
        for mod, cls in (("tensorboardX", "SummaryWriter"),
                         ("torch.utils.tensorboard", "SummaryWriter")):
            try:
                import importlib

                writer = getattr(importlib.import_module(mod), cls)
                self._tb = writer(logdir)
                break
            except Exception:  # noqa: BLE001 — any missing/broken backend
                continue

    def add_scalar(self, tag: str, value, step: int) -> None:
        if not self.enabled:
            return
        self._csv.write(f"{int(step)},{tag},{float(value):.6g}\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self) -> None:
        if self._csv is not None:
            self._csv.close()
        if self._tb is not None:
            self._tb.close()
