"""Running metric meters and append-only txt logs.

Reference AverageMeter (models/model_utils.py:214-229,
coclr_utils/utils.py:141-216) and the txt metric logs
(train_loss_and_acc.txt / val_loss_and_acc.txt / NMIs.txt / AMIs.txt /
global_retrieval_acc.txt — SURVEY §5 'Metrics / logging').
"""

from __future__ import annotations

import os
import time
from typing import Optional


class AverageMeter:
    def __init__(self, name: str = "", fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self) -> str:
        return f"{self.name} {self.val:.4f} ({self.avg:.4f})"


def append_metric_line(output_path: str, filename: str, line: str) -> None:
    """Append to <out>/tnet_checkpoints/<filename> like the reference logs."""
    log_dir = os.path.join(output_path, "tnet_checkpoints")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, filename), "a") as f:
        f.write(line.rstrip("\n") + "\n")


class StepTimer:
    """Per-step wall-clock timing as a first-class metric (SURVEY §5:
    the reference only logs epoch wall-clock; we track steps/sec too)."""

    def __init__(self):
        self.start = time.perf_counter()
        self.steps = 0

    def tick(self, n: int = 1) -> None:
        self.steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self.start
        return self.steps / dt if dt > 0 else 0.0
